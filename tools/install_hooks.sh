#!/usr/bin/env bash
# Installs the repo's git hooks. Run once per clone.
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"
chmod +x tools/precommit.sh
ln -sf ../../tools/precommit.sh .git/hooks/pre-commit
echo "pre-commit hook installed -> tools/precommit.sh"
