#!/usr/bin/env python3
"""Round-close gate: no SparkEntry.queries key may land without a selfcheck.

r11 process failure: x156_trend_regression was registered in the final
snapshot commit AFTER the last tools/selfcheck.py run, shipped unverified,
and was the round's only red CORRECTNESS row. This gate makes that class of
miss mechanical to catch: it diffs the query keys declared in the Scala
registries against the per-query dumps present in a Verify output
directory, and exits non-zero if any declared key was never dumped (i.e.
never ran against the oracle locally).

Usage:
    python3 tools/query_gate.py [verify_outdir]   # default /tmp/verify_out

Workflow rule (the check this script enforces): before any commit that
touches src/main/scala/graft/queries/, run
    sbt "runMain graft.Verify /root/testdata/sf0.01 <outdir>"
    python3 tools/selfcheck.py /root/testdata/sf0.01 <outdir>
    python3 tools/query_gate.py <outdir>
A targeted run (SPARK_GRAFT_ONLY=...) is fine for iteration, but the gate
run must be the FULL dump so removed/renamed keys are caught too.
Dev tool only -- NOT part of the shipped Scala library."""
import os
import re
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
outdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'

key_re = re.compile(r'"([qx]\d[0-9a-z_]*)" ->')
declared = set()
for f in ('ParityQueries.scala', 'ExtensionQueries.scala'):
    src = open(os.path.join(repo, 'src/main/scala/graft/queries', f)).read()
    declared |= set(key_re.findall(src))

if not os.path.isdir(outdir):
    sys.exit(f"query_gate: verify outdir {outdir} does not exist -- run "
             "graft.Verify first")
dumped = {d for d in os.listdir(outdir)
          if os.path.isdir(os.path.join(outdir, d))}

never_checked = sorted(declared - dumped)
stale = sorted(dumped - declared)

print(f"query_gate: {len(declared)} declared keys, {len(dumped)} dumped")
if stale:
    print(f"query_gate: note — {len(stale)} dumped dirs no longer declared "
          f"(rename/removal, or a partial SPARK_GRAFT_ONLY dump dir): {stale}")
if never_checked:
    print("query_gate: FAIL — declared but never selfchecked:")
    for k in never_checked:
        print(f"  {k}")
    sys.exit(1)
print("query_gate: OK — every declared query has a selfcheck dump")
