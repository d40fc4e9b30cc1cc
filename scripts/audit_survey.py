#!/usr/bin/env python3
"""Coverage audit: every query name mentioned in SURVEY.md must exist in the
driver contract (oracle_sql.json from a Verify dump), and every contract
query should be documented in SURVEY.md. Usage:

    python3 scripts/audit_survey.py <verifyOutDir>
"""
import json
import re
import sys

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/v_full001"
contract = set(json.load(open(f"{out}/oracle_sql.json")))
survey = open("SURVEY.md").read()
mentioned = set(re.findall(
    r"`((?:ex|q\d*|ta|dd|sim|st|mm|fmt)_[a-z0-9_]+)`", survey))
# names that are flags/prefixes, not queries
mentioned -= {"q_", "st_"}

ghost = sorted(m for m in mentioned if m not in contract)
undoc = sorted(c for c in contract if c not in mentioned)
print(f"contract queries: {len(contract)}; SURVEY mentions: {len(mentioned)}")
if ghost:
    print(f"MENTIONED BUT NOT IN CONTRACT ({len(ghost)}):")
    for g in ghost:
        print(f"  {g}")
if undoc:
    print(f"IN CONTRACT BUT NOT IN SURVEY ({len(undoc)}):")
    for u in undoc:
        print(f"  {u}")
if not ghost and not undoc:
    print("OK: SURVEY and contract agree exactly")
sys.exit(1 if ghost else 0)
