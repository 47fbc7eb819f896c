"""In-process line-coverage audit for the test suite (no coverage.py needed).

This environment has no coverage tooling installed, so this script uses
CPython 3.12's ``sys.monitoring`` directly: LINE events are DISABLE'd per
location after the first hit, making steady-state overhead near zero (the
full suite runs at ordinary speed).  Executable lines are derived from
compiled code objects (``co_lines``), so docstrings/comments don't count.

    python scripts/coverage_audit.py [pytest args...]       # default: tests/ -q

Caveats: subprocess-executed code (the examples harness, multihost workers,
CLI subprocess drives, daemon soaks) is NOT counted — cross-check low files
against those before calling something untested.  The round-5 audit measured
89.2% in-process on the then-306-test suite and drove the kernel-variant /
fallback-arm / codec-fallback test additions.
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
PREFIX = str(REPO / "jefferson_tpu") + "/"
TOOL = 4  # any free sys.monitoring tool id

hits: dict[str, set[int]] = {}
mon = sys.monitoring
mon.use_tool_id(TOOL, "jcov")


def _on_line(code, line):
    fn = code.co_filename
    if fn.startswith(PREFIX):
        s = hits.get(fn)
        if s is None:
            s = hits[fn] = set()
        s.add(line)
    return mon.DISABLE


def _executable_lines(path: Path) -> set[int]:
    try:
        code = compile(path.read_text(), str(path), "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [code]
    while stack:
        c = stack.pop()
        lines.update(ln for _, _, ln in c.co_lines() if ln is not None)
        stack.extend(k for k in c.co_consts if hasattr(k, "co_lines"))
    return lines


def _ranges(sorted_lines):
    out, start, prev = [], None, None
    for ln in sorted_lines:
        if start is None:
            start = prev = ln
        elif ln == prev + 1:
            prev = ln
        else:
            out.append((start, prev))
            start = prev = ln
    if start is not None:
        out.append((start, prev))
    return out


def main() -> int:
    mon.register_callback(TOOL, mon.events.LINE, _on_line)
    mon.set_events(TOOL, mon.events.LINE)
    import pytest

    argv = sys.argv[1:] or ["tests/", "-q"]
    rc = pytest.main(argv)
    mon.set_events(TOOL, 0)

    rows = []
    for path in sorted((REPO / "jefferson_tpu").rglob("*.py")):
        ex = _executable_lines(path)
        if not ex:
            continue
        missed = sorted(ex - hits.get(str(path), set()))
        rows.append((len(missed), len(ex), path, missed))
    rows.sort(reverse=True, key=lambda r: r[0])
    total_ex = sum(r[1] for r in rows)
    total_miss = sum(r[0] for r in rows)
    print(f"\nTOTAL: {total_ex - total_miss}/{total_ex} executable lines "
          f"({100 * (1 - total_miss / total_ex):.1f}%)\n")
    for missed_n, ex_n, path, missed in rows[:20]:
        rel = path.relative_to(REPO)
        rr = sorted(_ranges(missed), key=lambda ab: ab[0] - ab[1])
        shown = ", ".join(f"{a}-{b}" if b > a else str(a) for a, b in rr[:10])
        print(f"{rel}: {100 * (1 - missed_n / ex_n):.0f}% "
              f"({missed_n}/{ex_n} missed)  worst: {shown}")
    out = REPO / "coverage_lines.json"
    out.write_text(json.dumps({k: sorted(v) for k, v in hits.items()}))
    print(f"\nper-line hits -> {out}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
