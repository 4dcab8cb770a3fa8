import numpy as np

from dumphfdl_tpu import constants as C
from dumphfdl_tpu import sequences as seq


def test_frame_geometry():
    assert C.PREAMBLE_LEN == 531
    assert C.SINGLE_SLOT_FRAME_LEN == 4219
    assert C.DOUBLE_SLOT_FRAME_LEN == 8539
    for m in C.MODES:
        # data symbol counts are exact multiples of the scrambler period
        assert m.num_data_symbols % C.SCRAMBLER_PERIOD == 0
        assert m.num_encoded_bits % C.DEINTERLEAVER_ROW_CNT == 0


def test_mode_table():
    # bit rates and PDU sizes per reference mode table (hfdl.c:74-138, 1072)
    rates = [m.bit_rate for m in C.MODES]
    assert rates == [300, 600, 1200, 1800, 300, 600, 1200, 1800]
    assert [m.framebits for m in C.MODES] == [540, 1080, 2160, 3240,
                                              1260, 2520, 5040, 7560]
    assert [m.pdu_len_octets for m in C.MODES] == [68, 135, 270, 405,
                                                   158, 315, 630, 945]


def test_a_sequence():
    a = seq.a_bits()
    assert a.shape == (127,)
    # First 127 bits of the A octets with the leading masked bit dropped:
    # 0b01011011 -> 1011011...
    assert list(a[:7]) == [1, 0, 1, 1, 0, 1, 1]
    assert list(a[-8:]) == [1, 1, 1, 1, 1, 1, 1, 0]
    # A is (nearly) balanced like an m-sequence
    assert abs(int(a.sum()) - 64) <= 1


def test_m1_sequences_distinct():
    m = seq.m1_bits_all()
    assert m.shape == (8, 127)
    # all shifts pairwise distinct and well-separated
    for i in range(8):
        for j in range(i + 1, 8):
            agree = int((m[i] == m[j]).sum())
            corr = abs(2 * agree / 127 - 1)
            assert corr < 0.3, (i, j, corr)


def test_m2_prefix():
    for mode in range(8):
        assert np.array_equal(seq.m2_bits(mode), seq.m1_bits(mode)[:15])


def test_t_bits():
    t = seq.t_bits()
    # 0x9AF MSB-first over 15 bits
    assert list(t) == [0, 0, 0, 1, 0, 0, 1, 1, 0, 1, 0, 1, 1, 1, 1]
    # matches the reference's bipolar T_seq table (hfdl.c:157-160)
    bip = seq.bipolar(t)
    assert list(bip) == [1, 1, 1, -1, 1, 1, -1, -1, 1, -1, 1, -1, -1, -1, -1]


def test_scrambler():
    s = seq.scrambler_bits()
    assert s.shape == (120,)
    # m-sequence-like balance over one period of a 15-stage LFSR slice
    assert 40 < int(s.sum()) < 80
    # deterministic: restart gives the same sequence
    s2 = seq.scrambler_for_symbols(240)
    assert np.array_equal(s2[:120], s2[120:])
    # LFSR sanity: first bit = parity(0x4D4B & 0x4001)
    assert s[0] == (bin(0x4D4B & 0x4001).count('1') & 1)
