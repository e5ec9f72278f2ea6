"""Single-process encode/decode CPU profiler over the bench pages fixture.

No Spark: generates rows via sparc.fixtures.pages, encodes N stripes with
engine.stripe.encode_stripe, then cProfiles decode_stripe over them.  Used
to attribute decode CPU (the bench's weak axis) to specific kernels —
relative attribution is valid even on a noisy host because cProfile counts
are deterministic.

Usage: python scripts/profile_stripe.py [n_rows] [mode: decode|encode|both]
"""
import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, ".")

from sparc.fixtures import pages as pages_mod
from sparc.engine import stripe as stripe_mod


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "decode"
    stripe_rows = 9_375  # matches bench: 300k rows / 32 stripes
    tables = []
    off = 0
    while off < n_rows:
        k = min(stripe_rows, n_rows - off)
        tables.append(pages_mod.generate(k, seed=42, row_offset=off))
        off += k
    raw = sum(
        sum(c.nbytes for c in t.columns) for t in tables
    )
    print(f"{len(tables)} stripes, {n_rows} rows, {raw/1e6:.0f} MB raw")

    def encode_all():
        return [stripe_mod.encode_stripe(t) for t in tables]

    if mode in ("encode", "both"):
        pr = cProfile.Profile()
        pr.enable()
        enc = encode_all()
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
        print("==== ENCODE profile ====")
        print(s.getvalue())
    else:
        t0 = time.perf_counter()
        enc = encode_all()
        print(f"encode wall {time.perf_counter()-t0:.2f}s")

    comp = sum(len(v) for st, _ in enc for v in st.values())
    print(f"compressed {comp/1e6:.0f} MB")

    def decode_all():
        out = 0
        for streams, footer in enc:
            t = stripe_mod.decode_stripe(streams, footer)
            out += t.num_rows
        return out

    # warm run (page in)
    t0 = time.perf_counter()
    n = decode_all()
    warm = time.perf_counter() - t0
    print(f"decode wall {warm:.2f}s  ({raw/warm/1e9:.2f} GB/s single-core)")
    if mode in ("decode", "both"):
        pr = cProfile.Profile()
        pr.enable()
        decode_all()
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(35)
        print("==== DECODE profile ====")
        print(s.getvalue())


if __name__ == "__main__":
    main()
