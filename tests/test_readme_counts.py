"""Pin README's gate-count line to reality (the r8/r9 ADVICE item that
stayed stale two rounds running — now structurally impossible)."""

from __future__ import annotations

import re


def test_readme_gate_counts_match_entry():
    import __spark_entry__ as em

    text = open("/root/repo/README.md").read()
    m = re.search(r"queries\(\) \((\d+)\) / oracle_sql\(\) \((\d+)", text)
    assert m, "README gate-count line missing"
    assert int(m.group(1)) == len(em.queries()), (
        "README queries() count stale — update README.md")
    assert int(m.group(2)) == len(em.oracle_sql()), (
        "README oracle_sql() count stale — update README.md")
