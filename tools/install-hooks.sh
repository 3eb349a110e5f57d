#!/bin/bash
# Install the repo's git hooks (idempotent).
set -euo pipefail
cd "$(dirname "$0")/.."
install -m 755 tools/pre-commit .git/hooks/pre-commit
echo "installed .git/hooks/pre-commit"
