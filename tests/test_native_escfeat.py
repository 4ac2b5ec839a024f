"""Native ESC featurizer (escfeat.cpp): bit-equality with the numpy encoder."""

import numpy as np
import pytest

from escgnn_tpu.featurize.escgnn import EscConfig, esc_encode
from escgnn_tpu.native.escfeat import esc_encode_native
from tests.conftest import random_graph


@pytest.mark.parametrize("h,self_loop,use_rd", [
    (1, True, True), (2, True, True), (3, True, False),
    (2, False, True), (2, False, False),
])
def test_native_matches_numpy(rng, h, self_loop, use_rd):
    for _ in range(6):
        n, ei = random_graph(rng, max_n=14)
        cfg = EscConfig(h=h, use_rd=use_rd, self_loop=self_loop)
        ref = esc_encode(n, ei, cfg)
        nat = esc_encode_native(n, ei, cfg)
        if nat is None:
            pytest.skip("native featurizer unavailable")
        np.testing.assert_array_equal(ref.edge_index, nat.edge_index)
        np.testing.assert_array_equal(ref.enc_offsets, nat.enc_offsets)
        np.testing.assert_array_equal(ref.enc_idx, nat.enc_idx)
        np.testing.assert_array_equal(ref.enc_cnt, nat.enc_cnt)
        np.testing.assert_array_equal(
            ref.self_loop_attr_mask, nat.self_loop_attr_mask
        )


def test_native_declines_sampling(rng):
    n, ei = random_graph(rng, max_n=8)
    cfg = EscConfig(h=2, use_rd=True, self_loop=True, max_nodes_per_hop=2)
    assert esc_encode_native(n, ei, cfg) is None
