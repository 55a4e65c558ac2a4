"""Native C++ frontend == Python frontend, structure for structure."""

import numpy as np
import pytest

from virgo_plus_tpu import native
from virgo_plus_tpu.circuits.pws import parse_pws
from virgo_plus_tpu.circuits.layered import dag_to_layered, subset_init

PWS = """P V0 = I0 E
P V1 = I1 E
P V2 = V0 + V1 E
P V3 = V0 * V1 E
P V4 = V2 XOR V3 E
P V5 = V2 minus V0 E
P V6 = V3 NAAB V1 E
P V7 = V4 NOT V0 E
P V8 = V5 + V6 E
P V9 = V8 * V7 E
P O0 = V9 E
"""


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
@pytest.mark.parametrize("bug_compat", [True, False])
def test_native_matches_python(tmp_path, bug_compat):
    p = tmp_path / "c.pws"
    p.write_text(PWS)
    cn = native.load_circuit(str(p), bug_compat=bug_compat)
    cp = dag_to_layered(parse_pws(str(p)), bug_compat=bug_compat)
    subset_init(cp)
    assert cn.size == cp.size
    assert (cn.input_values == cp.input_values).all()
    for i in range(cp.size):
        a, b = cp.layers[i], cn.layers[i]
        assert a.size == b.size and a.bit_length == b.bit_length
        assert (a.ty == b.ty).all() and (a.u == b.u).all()
        assert (a.v == b.v).all() and (a.lv == b.lv).all()
        assert (a.l == b.l).all() and (a.c_real == b.c_real).all()
        assert a.max_dad_bit_length == b.max_dad_bit_length
        assert list(a.dad_size) == list(b.dad_size)
        for li in range(i):
            assert (a.dad_id[li] == b.dad_id[li]).all()
