#!/usr/bin/env bash
# Regenerate the README's test-count footer from an actual `sbt test` log
# (the count was hand-maintained and off by one two rounds running).
#
# Usage: sbt -batch test 2>&1 | tee /tmp/sbt_test.log
#        tools/update_readme_footer.sh /tmp/sbt_test.log
set -euo pipefail
log="${1:?usage: update_readme_footer.sh <sbt-test-log>}"
readme="$(dirname "$0")/../README.md"

# ScalaTest summary lines:
#   [info] Total number of tests run: NNN
#   [info] Suites: completed NNN, aborted 0
tests=$(grep -oE 'Total number of tests run: [0-9]+' "$log" | tail -1 | grep -oE '[0-9]+')
suites=$(grep -oE 'Suites: completed [0-9]+' "$log" | tail -1 | grep -oE '[0-9]+')
if [ -z "$tests" ] || [ -z "$suites" ]; then
  echo "could not find the ScalaTest summary in $log" >&2
  exit 1
fi
if ! grep -qE 'All tests passed.' "$log"; then
  echo "refusing to stamp a footer from a non-green run" >&2
  exit 1
fi

sed -i -E \
  "s|^sbt test( +)# [0-9]+ tests across [0-9]+ suites$|sbt test\\1# ${tests} tests across ${suites} suites|" \
  "$readme"
echo "README footer: ${tests} tests across ${suites} suites"
grep -n "tests across" "$readme"
