#!/usr/bin/env bash
# Builder-side leak scan — the self-evidencing counterpart to the driver's
# LEAKCHECK.json (round-7 VERDICT stretch item 8). Greps the committed
# source tree for patterns that would indicate non-public content leaking
# into the engine (internal hostnames, cloud buckets, credential shapes,
# chat-tool links) and emits a JSON record that carries the COMMIT HASH of
# the tree it scanned, so a future reader can verify the scan matches the
# code it claims to cover.
#
# Usage: scripts/leakscan.sh [> LEAKSCAN.json]
set -euo pipefail
cd "$(dirname "$0")/.."

TREE="$(git rev-parse HEAD 2>/dev/null || echo unknown)"
DIRTY="$(git status --porcelain 2>/dev/null | wc -l | tr -d ' ')"
# content hash of the EXACT bytes scanned (not just the commit pointer —
# a dirty tree would otherwise make "tree" misleading): sha256 over the
# per-file sha256s of every scanned path, in sorted order
CONTENT="$(find src build.sbt project -type f ! -path '*/target/*' 2>/dev/null \
  | sort | xargs sha256sum 2>/dev/null | sha256sum | cut -d' ' -f1)"

scan() { # scan <label> <regex> — prints JSON array of "file:line" hits
  local label="$1" re="$2"
  # -I skips binaries; restrict to the shipped tree (src/ + build).
  local hits
  hits=$(grep -rInE --exclude-dir=target "$re" src build.sbt project 2>/dev/null \
    | grep -v 'leakscan' | cut -d: -f1,2 || true)
  local json="[]"
  if [ -n "$hits" ]; then
    json=$(printf '%s\n' "$hits" | sed 's/"/\\"/g; s/^/"/; s/$/"/' \
      | paste -sd, -)
    json="[$json]"
  fi
  printf '    "%s": %s' "$label" "$json"
}

{
  echo '{'
  echo "  \"tree\": \"$TREE\","
  echo "  \"dirty_files\": $DIRTY,"
  echo "  \"scanned_content_sha256\": \"$CONTENT\","
  echo '  "hits": {'
  scan "internal-host"   '[a-z0-9-]+\.(corp|internal|intranet)\.'; echo ','
  scan "cloud-bucket"    's3://|gs://|abfss://|wasbs://'; echo ','
  scan "aws-key"         'AKIA[0-9A-Z]{16}'; echo ','
  scan "private-key"     'BEGIN (RSA|EC|OPENSSH) PRIVATE KEY'; echo ','
  scan "chat-link"       'slack\.com|hooks\.slack|discord(app)?\.com/api'; echo ','
  scan "bearer-token"    'Bearer [A-Za-z0-9_\-]{20,}'; echo ','
  scan "env-secret"      '(SECRET|TOKEN|PASSWORD|APIKEY|API_KEY)=[A-Za-z0-9]'
  echo ''
  echo '  }'
  echo '}'
}
