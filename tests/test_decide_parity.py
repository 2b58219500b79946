"""JAX batched decision vs spec decision: bit-identical FrameDecisions."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from vvctpu.coding import decide as jdecide  # noqa: E402
from vvctpu.spec import decide as sdecide  # noqa: E402

from test_codec_roundtrip import synth_frame  # noqa: E402


@pytest.mark.parametrize("qp", [22, 37])
def test_decisions_match(qp):
    planes = synth_frame(64, 128, seed=qp)
    orig = planes[0]
    sdec = sdecide.decide_frame(orig, qp)
    jdec = jdecide.decide_frame(orig, qp)
    assert np.array_equal(jdec.split32, sdec.split32)
    assert np.array_equal(jdec.split16, sdec.split16)
    assert np.array_equal(jdec.modes8, sdec.modes8)
