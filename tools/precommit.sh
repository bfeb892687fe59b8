#!/usr/bin/env bash
# Pre-commit guard: a commit that touches Scala sources or build.sbt
# must compile (main + test) before it may land. Round 5 shipped an
# end-of-round snapshot with 342 never-compiled lines and a missing
# import; every driver gate went red on one token. This hook makes
# that class of failure structurally impossible.
#
# Install (done by tools/install_hooks.sh):
#   ln -sf ../../tools/precommit.sh .git/hooks/pre-commit
#
# Skip intentionally (e.g. docs-only rework mid-refactor) with
# git commit --no-verify — but the end-of-round snapshot must never
# use it.
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"

# Only pay the compile cost when compilable sources are staged.
if git diff --cached --name-only | grep -qE '\.(scala|sbt)$'; then
  echo "[precommit] staged Scala/sbt changes -> sbt Test/compile" >&2
  if ! sbt -batch Test/compile > /tmp/precommit_sbt.log 2>&1; then
    tail -30 /tmp/precommit_sbt.log >&2
    echo "[precommit] COMPILE FAILED - commit rejected" >&2
    exit 1
  fi
  echo "[precommit] compile green" >&2
fi

# Registry/SURVEY sync guard (round-12, per the r11 verdict): every
# registered query from q195 on must appear in SURVEY.md by name (§8
# maps the registry per-query from that point; earlier queries live in
# grouped rows). A new qNNN that ships without its SURVEY rows is the
# doc-drift the round-10 verdict flagged.
if git diff --cached --name-only | grep -qE '\.(scala)$|SURVEY\.md'; then
  missing=$(grep -rohE '"q[0-9]+_[a-z0-9_]+"' src/main/scala --include='*.scala' \
    | tr -d '"' | sort -u \
    | awk -F_ '{ n = substr($1, 2) + 0; if (n >= 195) print }' \
    | while read -r q; do grep -q "$q" SURVEY.md || echo "$q"; done)
  if [ -n "$missing" ]; then
    echo "[precommit] registry queries missing from SURVEY.md:" >&2
    echo "$missing" >&2
    echo "[precommit] SURVEY SYNC FAILED - commit rejected" >&2
    exit 1
  fi
  echo "[precommit] registry/SURVEY sync green" >&2
fi
