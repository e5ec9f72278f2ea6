"""Randomized soundness property for predicate pruning.

Invariant under test (the one a pruning layer must never violate, and
the class of bug round-2 review found in the truncated-stats path): if
``pick_row_groups`` / ``sarg.keep`` excludes a region, NO row in that
region may match the predicate under SQL three-valued semantics.  The
mirror evaluator here is deliberately naive per-row Python — an
independent implementation, not a second copy of the engine's logic.

Covers: int/float/string columns with nulls, multibyte strings, strings
past the 1024-byte stats-truncation limit, =/</<=/>/>=/IN/BETWEEN/
IS NULL leaves, AND/OR/NOT compositions, and the bloom-filter
refutation layer (probed with both str and bytes literals).
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

from sparc.engine import sarg, stripe

STRIDE = 512
N_ROWS = 4096
N_PREDICATES = 120

UNKNOWN = object()  # three-valued logic: the SQL NULL truth value


def _make_table(rng: random.Random) -> pa.Table:
    n = N_ROWS
    ints, floats, strs = [], [], []
    # clustered values so group min/max are tight enough to prune
    for i in range(n):
        base = (i // STRIDE) * 1000
        ints.append(None if rng.random() < 0.1 else base + rng.randrange(500))
        floats.append(None if rng.random() < 0.1 else base + rng.random() * 400.0)
        r = rng.random()
        if r < 0.1:
            strs.append(None)
        elif r < 0.2:
            strs.append("é" * rng.randrange(1, 1500))  # multibyte, maybe >1024 B
        elif r < 0.3:
            strs.append("k" * rng.randrange(1025, 2000))  # truncated stats
        else:
            strs.append(f"w{base + rng.randrange(500):07d}")
    return pa.table(
        {
            "i": pa.array(ints, pa.int64()),
            "f": pa.array(floats, pa.float64()),
            "s": pa.array(strs, pa.string()),
        }
    )


def _probe_value(col: str, rows: list, rng: random.Random):
    vals = [r for r in rows if r is not None]
    if not vals or rng.random() < 0.3:  # out-of-range / absent probes
        return {"i": rng.randrange(-5000, 50_000), "f": rng.uniform(-5e3, 5e4),
                "s": f"w{rng.randrange(50_000):07d}"}[col]
    return rng.choice(vals)


def _make_pred(cols: dict[str, list], rng: random.Random, depth: int = 0) -> tuple:
    if depth < 2 and rng.random() < 0.4:
        op = rng.choice(["and", "or", "not"])
        if op == "not":
            return ("not", _make_pred(cols, rng, depth + 1))
        return (
            op,
            _make_pred(cols, rng, depth + 1),
            _make_pred(cols, rng, depth + 1),
        )
    col = rng.choice(list(cols))
    rows = cols[col]
    op = rng.choice(["=", "<", "<=", ">", ">=", "in", "between", "is_null"])
    if op == "is_null":
        return ("is_null", col)
    if op == "in":
        k = rng.randrange(1, 4)
        return ("in", col, [_probe_value(col, rows, rng) for _ in range(k)])
    if op == "between":
        a, b = _probe_value(col, rows, rng), _probe_value(col, rows, rng)
        if b < a:
            a, b = b, a
        return ("between", col, a, b)
    return (op, col, _probe_value(col, rows, rng))


def _eval_row(pred: tuple, row: dict):
    """SQL three-valued truth of pred on one row: True / False / UNKNOWN."""
    op = pred[0]
    if op == "and":
        vals = [_eval_row(c, row) for c in pred[1:]]
        if any(v is False for v in vals):
            return False
        return UNKNOWN if any(v is UNKNOWN for v in vals) else True
    if op == "or":
        vals = [_eval_row(c, row) for c in pred[1:]]
        if any(v is True for v in vals):
            return True
        return UNKNOWN if any(v is UNKNOWN for v in vals) else False
    if op == "not":
        v = _eval_row(pred[1], row)
        return UNKNOWN if v is UNKNOWN else (not v)
    v = row[pred[1]]
    if op == "is_null":
        return v is None
    if v is None:
        return UNKNOWN
    if op == "in":
        return v in pred[2]
    if op == "between":
        return pred[2] <= v <= pred[3]
    return {
        "=": v == pred[2],
        "<": v < pred[2],
        "<=": v <= pred[2],
        ">": v > pred[2],
        ">=": v >= pred[2],
    }[op]


def _group_rows(cols: dict[str, list], g: int) -> list[dict]:
    lo, hi = g * STRIDE, min((g + 1) * STRIDE, N_ROWS)
    names = list(cols)
    return [{c: cols[c][i] for c in names} for i in range(lo, hi)]


def _run(seed: int, bloom: bool) -> None:
    rng = random.Random(seed)
    t = _make_table(rng)
    cols = {c: t.column(c).to_pylist() for c in t.column_names}
    streams, footer = stripe.encode_stripe(
        t,
        row_index_stride=STRIDE,
        bloom_columns=["i", "s"] if bloom else None,
    )
    n_rgs = (N_ROWS + STRIDE - 1) // STRIDE
    stripe_stats = {
        c["name"]: c["stats"] for c in footer["columns"] if c.get("stats")
    }
    for _ in range(N_PREDICATES):
        pred = _make_pred(cols, rng)
        picked = stripe.pick_row_groups(
            footer, pred, streams=streams if bloom else None
        )
        picked_set = set(range(n_rgs)) if picked is None else set(picked)
        for g in range(n_rgs):
            if g in picked_set:
                continue  # kept groups may contain anything
            matches = [
                r for r in _group_rows(cols, g) if _eval_row(pred, r) is True
            ]
            assert not matches, (
                f"seed={seed} bloom={bloom} pred={pred!r}: pruned group {g} "
                f"contains {len(matches)} matching rows, e.g. {matches[0]!r}"
            )
        if not sarg.keep(pred, stripe_stats):
            all_rows = [dict(zip(cols, vs)) for vs in zip(*cols.values())]
            matches = [r for r in all_rows if _eval_row(pred, r) is True]
            assert not matches, (
                f"seed={seed} pred={pred!r}: stripe refuted but "
                f"{len(matches)} rows match"
            )


def test_rowgroup_prune_soundness_random():
    for seed in (11, 23, 37):
        _run(seed, bloom=False)


def test_rowgroup_prune_soundness_random_with_bloom():
    for seed in (41, 53):
        _run(seed, bloom=True)


def test_bloom_probe_bytes_vs_str_soundness():
    # probing a str column with a bytes literal (and vice versa) must
    # never produce a wrong prune — the ADVICE-r2 bloom dtype bug class
    vals = [f"key{i:04d}" for i in range(2000)]
    t = pa.table({"s": pa.array(vals, pa.string())})
    streams, footer = stripe.encode_stripe(
        t, row_index_stride=512, bloom_columns=["s"]
    )
    for probe in ("key0100", b"key0100"):
        picked = stripe.pick_row_groups(footer, ("=", "s", probe), streams=streams)
        picked_set = (
            set(range((2000 + 511) // 512)) if picked is None else set(picked)
        )
        assert 0 in picked_set, f"probe {probe!r} wrongly pruned the group holding it"
