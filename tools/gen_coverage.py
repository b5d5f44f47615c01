#!/usr/bin/env python3
"""Regenerate the generated query-status table in COVERAGE.md.

Joins the registry metadata (graft.RegistryDump output) with a driver
CORRECTNESS_r{N}.json and rewrites the marked section of COVERAGE.md,
so the per-round "query -> §2 rows -> correctness" table is emitted,
not hand-maintained.

Usage:
  sbt -batch "runMain graft.RegistryDump /tmp/registry.json"
  python3 tools/gen_coverage.py /tmp/registry.json CORRECTNESS_r07.json

A query missing from the correctness file (registered after that
driver run) is marked "pending" — the next driver run turns it into a
pass/FAIL row.
"""
import json
import sys

BEGIN = "<!-- BEGIN GENERATED QUERY TABLE (tools/gen_coverage.py) -->"
END = "<!-- END GENERATED QUERY TABLE -->"


def status(name: str, has_oracle: bool, corr: dict) -> str:
    if name not in corr:
        return "pending next driver run"
    row = corr[name]
    if row.get("err"):
        return "ERROR"
    checks = ("rows_match", "schema_match", "hash_match")
    if all(row.get(c) for c in checks):
        kind = "oracle" if has_oracle else "rows-only"
        return f"pass ({kind}, {row['spark_rows']} rows)"
    failed = [c for c in checks if not row.get(c)]
    return "FAIL " + ",".join(failed)


def main(reg_path: str, corr_path: str,
         cov_path: str = "COVERAGE.md") -> int:
    reg = json.load(open(reg_path))
    corr = json.load(open(corr_path))
    lines = [
        BEGIN,
        "",
        f"## Registered queries × correctness ({corr_path})",
        "",
        f"{len(reg)} registered queries. Regenerate with "
        "`runMain graft.RegistryDump` + `tools/gen_coverage.py` — "
        "do not edit by hand.",
        "",
        "| query | §2 rows | correctness |",
        "|---|---|---|",
    ]
    for d in sorted(reg, key=lambda d: d["name"]):
        lines.append(
            f"| `{d['name']}` | {d['survey']} | "
            f"{status(d['name'], d['oracle'], corr)} |")
    n_pass = sum(1 for d in reg if status(
        d["name"], d["oracle"], corr).startswith("pass"))
    n_pending = sum(1 for d in reg if d["name"] not in corr)
    lines += [
        "",
        f"**{n_pass}/{len(reg)} pass under {corr_path}; "
        f"{n_pending} registered since that run.**",
        "",
        END,
    ]
    block = "\n".join(lines)
    text = open(cov_path).read()
    if BEGIN in text:
        pre = text[:text.index(BEGIN)]
        post = text[text.index(END) + len(END):]
        text = pre + block + post
    else:
        text = text.rstrip("\n") + "\n\n" + block + "\n"
    open(cov_path, "w").write(text)
    print(f"updated {cov_path}: {n_pass}/{len(reg)} pass, "
          f"{n_pending} pending")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
