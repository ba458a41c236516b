"""AUTOUGH2 / TOUGH2 listing-file reader.

Minimal parser for the benchmark reference results checked into the
reference repository (test/benchmark/*/run/*.listing): extracts the
ELEMENT TABLE time series (the role CREDO's T2ModelResult plays in the
reference's benchmark harness).
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np


def read_listing(filename: str):
    """Parse a listing file.

    Returns (times [nt], tables: {column_name: [nt, n_elements]}).
    Column names as in the file header (e.g. 'Pressure',
    'Temperature', 'Vapour saturation').
    """
    with open(filename, errors="replace") as f:
        lines = f.readlines()

    times: List[float] = []
    data: Dict[str, List[List[float]]] = {}
    i = 0
    n = len(lines)
    time_re = re.compile(
        r"OUTPUT AFTER\s+\d+\s+TIME STEPS\s+([0-9.eE+\-]+)\s+SECONDS"
    )
    while i < n:
        line = lines[i]
        if "ELEMENT TABLE" in line:
            # find the time from the preceding OUTPUT AFTER line
            t = None
            for j in range(i, max(0, i - 10), -1):
                m = time_re.search(lines[j])
                if m:
                    t = float(m.group(1))
                    break
            # header: next non-blank line
            j = i + 1
            while j < n and not lines[j].strip():
                j += 1
            header = lines[j]
            # columns: fixed-ish header names after ELEMENT, INDEX
            names = re.split(r"\s{2,}", header.strip())
            names = [s.strip() for s in names if s.strip()]
            assert names[0].upper() == "ELEMENT"
            col_names = names[2:]
            j += 1
            rows = []
            while j < n:
                row = lines[j]
                s = row.strip()
                if not s:
                    j += 1
                    if rows:
                        # blank after data rows may just separate pages
                        nxt = lines[j].strip() if j < n else ""
                        if not re.match(r"^\S", nxt):
                            pass
                    continue
                if s.startswith("EEEE") or s.startswith("@") or "TABLE" in s:
                    break
                # data row: ends with numbers; element name may contain
                # spaces -> parse from the right
                toks = s.replace("1    ", "", 0).split()
                vals = []
                for tkn in reversed(toks):
                    try:
                        vals.append(float(tkn))
                    except ValueError:
                        break
                vals = vals[::-1]
                if len(vals) >= len(col_names) + 1:
                    rows.append(vals[-len(col_names):])
                j += 1
            if rows and t is not None:
                times.append(t)
                for k, name in enumerate(col_names):
                    data.setdefault(name, []).append(
                        [r[k] for r in rows]
                    )
            i = j
        else:
            i += 1

    tables = {
        k: np.asarray(v, dtype=np.float64) for k, v in data.items()
    }
    return np.asarray(times), tables
