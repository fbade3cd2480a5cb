"""Minimal gRPC service plumbing without generated *_pb2_grpc stubs.

protoc in this environment generates message classes only, so services are
wired explicitly: `make_handlers` builds the server-side generic handler and
`ClientStub` builds the matching client callables. Method tables are shared
by both sides.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import grpc

MethodTable = Dict[str, Tuple[Any, Any]]  # name -> (request_cls, response_cls)


def make_handlers(service_name: str, methods: MethodTable,
                  impl: Any) -> grpc.GenericRpcHandler:
  """Generic handler mapping each method to impl.<MethodName>."""
  handlers = {}
  for name, (req_cls, resp_cls) in methods.items():
    fn = getattr(impl, name)
    handlers[name] = grpc.unary_unary_rpc_method_handler(
        fn,
        request_deserializer=req_cls.FromString,
        response_serializer=resp_cls.SerializeToString)
  return grpc.method_handlers_generic_handler(service_name, handlers)


class ClientStub:
  """Client with one callable per method: stub.MethodName(request)."""

  def __init__(self, channel: grpc.Channel, service_name: str,
               methods: MethodTable):
    for name, (req_cls, resp_cls) in methods.items():
      setattr(self, name, channel.unary_unary(
          f'/{service_name}/{name}',
          request_serializer=req_cls.SerializeToString,
          response_deserializer=resp_cls.FromString))


def serve(handlers, port: int = 0,
          max_message_mb: int = 40) -> Tuple[grpc.Server, int]:
  """Start a server with the given generic handlers; returns (server, port)."""
  import concurrent.futures
  options = [
      ('grpc.max_send_message_length', max_message_mb * 1024 * 1024),
      ('grpc.max_receive_message_length', max_message_mb * 1024 * 1024),
  ]
  server = grpc.server(
      concurrent.futures.ThreadPoolExecutor(max_workers=4), options=options)
  for h in handlers:
    server.add_generic_rpc_handlers((h,))
  bound = server.add_insecure_port(f'localhost:{port}')
  server.start()
  return server, bound
