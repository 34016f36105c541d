"""gRPC server + Python SDK client.

Capability parity with neumann_server (tonic QueryService/Points/
Collections/Blob/Health, auth/rate-limit/audit) and neumann-py /
neumann_client (remote + embedded modes).
"""

from neumann_tpu.server.server import NeumannServer  # noqa: F401
from neumann_tpu.server.client import NeumannClient  # noqa: F401
from neumann_tpu.server.retry import RetryConfig  # noqa: F401
from neumann_tpu.server.transaction import Transaction  # noqa: F401
