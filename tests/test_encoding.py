import numpy as np

from dualmessagepassing_tpu.ops.encoding import (
    get_enc_len,
    int2anybase,
    int2multihot,
    multihot_table,
    position_table,
)


def test_get_enc_len_scalar():
    assert get_enc_len(0, 2) == 1
    assert get_enc_len(1, 2) == 1
    assert get_enc_len(2, 2) == 2
    assert get_enc_len(7, 2) == 3
    assert get_enc_len(8, 2) == 4
    assert get_enc_len(99, 10) == 2
    assert get_enc_len(100, 10) == 3


def test_get_enc_len_array():
    x = np.array([0, 1, 5, 63, 64])
    np.testing.assert_array_equal(get_enc_len(x, 2), [1, 1, 3, 6, 7])


def test_int2anybase():
    np.testing.assert_array_equal(int2anybase(13, 4, 2), [1, 1, 0, 1])
    np.testing.assert_array_equal(int2anybase(205, 3, 10), [2, 0, 5])
    # mod base**len semantics
    np.testing.assert_array_equal(int2anybase(205, 2, 10), [0, 5])


def test_int2multihot_layout():
    # 6 = 110 in base 2, len 3 -> blocks one-hot at [1, 1, 0]
    rep = int2multihot(6, 3, 2)
    np.testing.assert_array_equal(rep, [0, 1, 0, 1, 1, 0])
    # leading zero blocks are one-hot at digit 0 (reference embed.py:84-86)
    rep = int2multihot(1, 3, 2)
    np.testing.assert_array_equal(rep, [1, 0, 1, 0, 0, 1])


def test_multihot_table_shape():
    t = multihot_table(28, 2)  # enc_len(27, 2) = 5
    assert t.shape == (28, 10)
    # each block sums to one
    assert (t.reshape(28, 5, 2).sum(-1) == 1).all()


def test_position_table():
    t = position_table(8, 16)
    assert t.shape == (16, 8)
    assert np.allclose(t[0], [0, 0, 0, 0, 1, 1, 1, 1])
