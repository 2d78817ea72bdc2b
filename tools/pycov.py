"""Line-coverage runner for the test suite (no external deps).

The reference ships `make coverage` via gcovr (reference
src/Makefile:285-287); this is the equivalent for this repo's Python
core, built on sys.monitoring (PEP 669): a LINE callback that records
each (file, line) once and then disables that location, so steady-state
overhead is near zero and the full suite stays runnable.

Usage:
    python tools/pycov.py run -m pytest tests/ -q   # collect -> .pycov.json
    python tools/pycov.py report                    # per-file table
    python tools/pycov.py report --min 80           # fail under threshold

Caveats (documented, by design):
  - subprocesses (multiprocess stress tests, sanitizer drivers) are not
    traced; their covered lines come from the in-process tests only.
  - "executable lines" are derived from compiled code objects'
    co_lines(), the same source of truth the interpreter reports
    against, so percentages are comparable to coverage.py's.
"""

from __future__ import annotations

import json
import os
import runpy
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
PKG = os.path.join(ROOT, "nxsearch_tpu")
OUT = os.path.join(ROOT, ".pycov.json")

_hits: dict[str, set[int]] = {}


def _on_line(code, line):
    fn = code.co_filename
    if fn.startswith(PKG):
        s = _hits.get(fn)
        if s is None:
            s = _hits[fn] = set()
        s.add(line)
    return sys.monitoring.DISABLE


def _collect(argv: list[str]) -> None:
    mon = sys.monitoring
    tool = mon.COVERAGE_ID
    mon.use_tool_id(tool, "pycov")
    mon.register_callback(tool, mon.events.LINE, _on_line)
    mon.set_events(tool, mon.events.LINE)
    sys.argv = argv[1:] if argv and argv[0] == "-m" else argv
    code = 0
    try:
        if argv and argv[0] == "-m":
            runpy.run_module(argv[1], run_name="__main__", alter_sys=True)
        else:
            runpy.run_path(argv[0], run_name="__main__")
    except SystemExit as e:
        code = int(e.code or 0) if not isinstance(e.code, str) else 1
    finally:
        mon.set_events(tool, 0)
        data = {fn: sorted(lines) for fn, lines in _hits.items()}
        with open(OUT, "w") as f:
            json.dump(data, f)
        print(f"[pycov] wrote {OUT} ({len(data)} files)", file=sys.stderr)
    raise SystemExit(code)


def _executable_lines(path: str) -> set[int]:
    """All line numbers the compiler emits for a module (recursively
    through nested code objects), minus def/class headers' doc lines."""
    with open(path, "rb") as f:
        src = f.read()
    try:
        top = compile(src, path, "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [top]
    while stack:
        co = stack.pop()
        for _, _, ln in co.co_lines():
            if ln is not None and ln > 0:
                lines.add(ln)
        for const in co.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    return lines


def _report(min_pct: float) -> None:
    if not os.path.exists(OUT):
        print(f"no {OUT}; run `python tools/pycov.py run -m pytest "
              f"tests/ -q` first", file=sys.stderr)
        raise SystemExit(2)
    with open(OUT) as f:
        hits = {fn: set(v) for fn, v in json.load(f).items()}
    rows = []
    tot_exec = tot_hit = 0
    for dirpath, _dirs, files in os.walk(PKG):
        if "__pycache__" in dirpath:
            continue
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            path = os.path.join(dirpath, name)
            ex = _executable_lines(path)
            if not ex:
                continue
            hit = len(ex & hits.get(path, set()))
            tot_exec += len(ex)
            tot_hit += hit
            rows.append((os.path.relpath(path, ROOT), hit, len(ex)))
    rows.sort(key=lambda r: r[1] / r[2])
    width = max(len(r[0]) for r in rows)
    for rel, hit, ex in rows:
        print(f"{rel:<{width}}  {hit:>5}/{ex:<5}  {100.0 * hit / ex:5.1f}%")
    pct = 100.0 * tot_hit / max(tot_exec, 1)
    print(f"{'TOTAL':<{width}}  {tot_hit:>5}/{tot_exec:<5}  {pct:5.1f}%")
    if pct < min_pct:
        print(f"coverage {pct:.1f}% < --min {min_pct}%", file=sys.stderr)
        raise SystemExit(1)


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in ("run", "report"):
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    if sys.argv[1] == "run":
        if len(sys.argv) < 3:
            print("run: missing command", file=sys.stderr)
            raise SystemExit(2)
        _collect(sys.argv[2:])
    else:
        min_pct = 0.0
        if "--min" in sys.argv:
            min_pct = float(sys.argv[sys.argv.index("--min") + 1])
        _report(min_pct)


if __name__ == "__main__":
    main()
