#!/bin/bash
# Run the full ScalaTest suite and, on success, record the src tree that
# passed in TESTED_TREE. tools/pre-commit (install: tools/install-hooks.sh)
# refuses to commit src/** changes whose staged tree does not match this
# marker — the round-11 lesson: a snapshot commit added two operators after
# the last test run and shipped a red board. Docs-only commits are exempt.
set -euo pipefail
cd "$(dirname "$0")/.."

# Hash the WORKING-TREE src + build.sbt via a throwaway index BEFORE the
# run, so the marker describes exactly what the suite ran against even if
# files change while it runs.
TMPIDX=$(mktemp -u)
trap 'rm -f "$TMPIDX"' EXIT
GIT_INDEX_FILE="$TMPIDX" git add -f src build.sbt
TREE=$(GIT_INDEX_FILE="$TMPIDX" git write-tree)
SRC_TREE=$(git rev-parse "$TREE:src")
BUILD_BLOB=$(git rev-parse "$TREE:build.sbt")

sbt -batch test

{
  echo "src_tree=$SRC_TREE"
  echo "build_sbt=$BUILD_BLOB"
  echo "tested_utc=$(date -u +%Y-%m-%dT%H:%M:%SZ)"
} > TESTED_TREE
echo "green: recorded src tree $SRC_TREE in TESTED_TREE"
