"""Generate (or verify) the README's declared-query table from
``registry.by_family()`` — VERDICT r7 ask #8: the coverage table is
derived from the registry itself, so it cannot drift.

Usage:
    python tools/gen_registry_table.py            # rewrite README block
    python tools/gen_registry_table.py --check    # exit 1 if out of sync
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BEGIN = "<!-- BEGIN GENERATED REGISTRY TABLE (tools/gen_registry_table.py) -->"
END = "<!-- END GENERATED REGISTRY TABLE -->"
README = os.path.join(REPO, "README.md")


def render() -> str:
    from robin_sparkles_spark import registry

    fams = registry.by_family()
    specs = registry.all_queries()
    n_total = sum(len(v) for v in fams.values())
    n_rows_only = sum(1 for s in specs.values() if s.oracle is None)
    lines = [
        BEGIN,
        "",
        f"{n_total} declared queries in {len(fams)} families "
        f"({n_total - n_rows_only} DuckDB-oracle-gated, {n_rows_only} "
        "rows-only, marked \\*). Regenerate with "
        "`python tools/gen_registry_table.py`; "
        "`tests/test_registry_table.py` fails if this block drifts.",
        "",
        "| Family (operator module) | n | Declared queries |",
        "|---|---|---|",
    ]
    for fam, names in fams.items():
        shown = ", ".join(
            f"`{n}`" + ("\\*" if specs[n].oracle is None else "")
            for n in names
        )
        lines.append(f"| {fam} | {len(names)} | {shown} |")
    lines += ["", END]
    return "\n".join(lines)


def main(argv: list[str]) -> int:
    text = open(README).read()
    block = render()
    if BEGIN not in text or END not in text:
        new = text.rstrip() + "\n\n## Declared query registry (generated)\n\n" + block + "\n"
    else:
        lo, hi = text.index(BEGIN), text.index(END) + len(END)
        new = text[:lo] + block + text[hi:]
    if "--check" in argv:
        if new != text:
            print("README registry table is out of sync — run "
                  "`python tools/gen_registry_table.py`", file=sys.stderr)
            return 1
        print("README registry table in sync")
        return 0
    if new != text:
        open(README, "w").write(new)
        print("README registry table rewritten")
    else:
        print("README registry table already in sync")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
