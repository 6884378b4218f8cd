"""Shared eval-log parsers for the scripts/harvest_*.py artifact builders.

One copy so a regex fix cannot silently diverge between the round's
committed artifacts (harvest scripts run as `python scripts/<name>.py`,
which puts this directory on sys.path).
"""
import ast
import re
from pathlib import Path


def last_dict(path: Path) -> dict:
    """The eval tools print a python dict literal as their final summary."""
    out = None
    for line in path.read_text().splitlines():
        s = line.strip()
        if s.startswith("{") and s.endswith("}"):
            out = ast.literal_eval(s)
    if out is None:
        raise SystemExit(f"no summary dict in {path}")
    return out


def recall_table(path: Path) -> dict:
    """Parse `[Soft ][Weak ][Mean ]Recall@K: v` lines -> flat dict."""
    table = {}
    pat = re.compile(r"^((?:Soft )?(?:Weak )?(?:Mean )?Recall@\d+): ([\d.]+)")
    for line in path.read_text().splitlines():
        m = pat.match(line.strip())
        if m:
            table[m.group(1)] = float(m.group(2))
    if not table:
        raise SystemExit(f"no recall lines in {path}")
    return table
