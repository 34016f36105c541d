"""`python -m neumann_tpu.server` — start the gRPC + REST server."""

from neumann_tpu.server.server import main

raise SystemExit(main())
