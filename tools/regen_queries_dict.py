"""Rewrite the ``queries()`` return-dict in __spark_entry__.py so its entry
order matches tools/window_order.compute_order(...) with the current
ROUND_HEAD. Mechanical: preserves each ``"gate": func,`` line verbatim,
only reorders. Run after adding gates or rotating ROUND_HEAD:

    python3 tools/regen_queries_dict.py
"""

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__spark_entry__.py")


def main():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    sys.path.insert(0, REPO)
    import window_order as wo

    with open(ENTRY) as f:
        src = f.read()

    # Locate the return dict inside queries(): from "    return {" after
    # "def queries()" to the matching "    }".
    m = re.search(r"(def queries\(\).*?return \{\n)(.*?)(\n    \}\n)", src, re.S)
    if not m:
        raise SystemExit("queries() return dict not found")
    body = m.group(2)
    entries = {}
    for line in body.splitlines():
        lm = re.match(r'\s*"([^"]+)":\s*(\S+?),\s*$', line)
        if not lm:
            raise SystemExit("unparsed dict line: %r" % line)
        entries[lm.group(1)] = lm.group(2)

    order = wo.compute_order(list(entries), wo.gate_history(), **wo.ROUND_HEAD)
    assert sorted(order) == sorted(entries), "gate set mismatch"
    new_body = "\n".join('        "%s": %s,' % (g, entries[g]) for g in order)
    with open(ENTRY, "w") as f:
        f.write(src[: m.start(2)] + new_body + src[m.end(2):])
    print("reordered %d entries; window head: %s" % (len(order), order[:12]))


if __name__ == "__main__":
    main()
