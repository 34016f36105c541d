#!/bin/bash
# neumann-tpu installer (install.sh parity with the reference).
#
# Usage: ./install.sh            — editable install into the active env
#        NEUMANN_VENV=~/.neumann ./install.sh
#                                — create a venv there first
#
# Installs the package plus the three console entry points
# (neumann-tpu, neumann-tpu-server, neumann-tpu-node), verifies the
# import, warms the native extensions (codec/lexer/parser/ordered
# index compile with g++ at first use; pure-Python fallbacks engage
# when no toolchain exists), and runs the doctor.

set -euo pipefail

BLUE='\033[0;34m'; GREEN='\033[0;32m'; YELLOW='\033[0;33m'; NC='\033[0m'
info()    { echo -e "${BLUE}==>${NC} $1"; }
success() { echo -e "${GREEN}==>${NC} $1"; }
warn()    { echo -e "${YELLOW}==>${NC} $1"; }

HERE="$(cd "$(dirname "$0")" && pwd)"
PY="${PYTHON:-python3}"

if [ -n "${NEUMANN_VENV:-}" ]; then
    info "creating venv at ${NEUMANN_VENV}"
    "$PY" -m venv "$NEUMANN_VENV"
    PY="$NEUMANN_VENV/bin/python"
fi

info "installing neumann-tpu (editable) from $HERE"
"$PY" -m pip install -q -e "$HERE"

info "verifying import and warming native extensions"
"$PY" - <<'EOF'
import neumann_tpu  # noqa: F401
from neumann_tpu.native import pycodec, pyparser
from neumann_tpu import native
print("  codec  :", "native" if pycodec.available() else "pure-python")
print("  parser :", "native" if pyparser.available() else "pure-python")
print("  index  :", "native" if native.available() else "pure-python")
EOF

if "$PY" -c "import jax" 2>/dev/null; then
    success "jax found — device path available"
else
    warn "jax not installed: host paths work; install jax for the TPU scan path"
fi

success "installed. Try:  $("$PY" -c 'import sys; print(sys.prefix)')/bin/neumann-tpu"
echo "          REPL: neumann-tpu    server: neumann-tpu-server    cluster node: neumann-tpu-node"
