"""CABAC engine property tests: encode ∘ decode = identity (SURVEY.md §4)."""
import random

import numpy as np
import pytest

from vvctpu.cabac import contexts as C
from vvctpu.cabac.engine import CabacDecoder, CabacEncoder


def _roundtrip(ops, qp=32, slice_type=2):
    enc = CabacEncoder(C.make_ctx_state(slice_type, qp))
    for op, ctx, v in ops:
        {"ctx": lambda: enc.bin(ctx, v),
         "byp": lambda: enc.bypass(v),
         "term": lambda: enc.terminate(v)}[op]()
    data = enc.finish()
    dec = CabacDecoder(C.make_ctx_state(slice_type, qp), data)
    for i, (op, ctx, v) in enumerate(ops):
        got = {"ctx": lambda: dec.bin(ctx),
               "byp": lambda: dec.bypass(),
               "term": lambda: dec.terminate()}[op]()
        assert got == v, (i, op, ctx, v, got)
    return data


def test_random_bins_many_seeds():
    random.seed(42)
    for _ in range(20):
        n = random.randint(1, 800)
        ops = []
        for _ in range(n):
            k = random.random()
            if k < 0.55:
                ops.append(("ctx", random.randrange(C.NUM_CTX),
                            random.randint(0, 1)))
            elif k < 0.9:
                ops.append(("byp", None, random.randint(0, 1)))
            else:
                ops.append(("term", None, 0))
        ops.append(("term", None, 1))
        _roundtrip(ops, qp=random.randint(0, 63))


def test_skewed_source_compresses():
    random.seed(1)
    ops = [("ctx", C.SIG_FLAG(0), 1 if random.random() < 0.03 else 0)
           for _ in range(4000)]
    ops.append(("term", None, 1))
    data = _roundtrip(ops)
    # 4000 bins at p~0.03 -> entropy ~0.19 bpb; adaptive coder should get close
    assert len(data) * 8 < 4000 * 0.5


def test_all_zero_and_all_one():
    for v in (0, 1):
        ops = [("ctx", 0, v)] * 1000 + [("term", None, 1)]
        data = _roundtrip(ops)
        assert len(data) * 8 < 300


def test_context_state_snapshot():
    st = C.make_ctx_state(2, 32)
    snap = st.snapshot()
    st.update(3, 1)
    st.update(3, 1)
    assert st.state(3) != (snap[0][3] << 4) + snap[1][3]
    st.restore(snap)
    assert st.state(3) == (int(snap[0][3]) << 4) + int(snap[1][3])
