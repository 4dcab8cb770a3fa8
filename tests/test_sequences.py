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


# ---- scrambler parameterization theorem (VERDICT r4 #2) ------------------
#
# hfdl.c:332-346 carries TWO (genpoly, init) pairs selected by the
# installed liquid-dsp version:
#   liquid <  1.6:  (0x8002, 0x6959)
#   liquid >= 1.6:  (0x4001, 0x4D4B)   # "0x6959 reversed"
# Both liquid builds of dumphfdl decode the same off-air signal, so the
# two parameterizations MUST describe one and the same 120-bit sequence.
# The tests below make that a theorem rather than a guess: the pairs are
# reversal-conjugates of a single 15-stage Fibonacci LFSR -- liquid's
# 1.6 API change reversed the register sense (old: generator passed with
# an implicit leading term and right-shifted once at create; new: taken
# verbatim), so the old pair is the new pair with every 15-bit constant
# bit-reversed.  A left-shift LFSR conjugated by bit reversal IS the
# right-shift LFSR with reversed constants, hence identical output bits.

def _rev15(v: int) -> int:
    return int(f'{v:015b}'[::-1], 2)


def _lfsr_left(g: int, v: int, n: int) -> list[int]:
    """New-liquid engine (msequence_advance): b = parity(v & g),
    v <- ((v << 1) | b) mod 2^15."""
    out = []
    for _ in range(n):
        b = bin(v & g).count('1') & 1
        v = ((v << 1) | b) & 0x7FFF
        out.append(b)
    return out


def _lfsr_right(g: int, v: int, n: int) -> list[int]:
    """Reversal-conjugate engine: b = parity(v & g), v <- (v >> 1) | b<<14."""
    out = []
    for _ in range(n):
        b = bin(v & g).count('1') & 1
        v = (v >> 1) | (b << 14)
        out.append(b)
    return out


def test_scrambler_parameterizations_are_one_sequence():
    # the old pair's constants are exactly the new pair's, bit-reversed
    # over the 15-bit register (the old genpoly carries the degree-15
    # leading term in bit 15, dropped by old liquid's create: 0x8002 >> 1
    # == 0x4001, and rev15(0x4001) == 0x4001 -- x^15+x+1 reversed is
    # x^15+x^14+1, the same mask once the leading term is dropped)
    assert _rev15(0x4D4B) == 0x6959
    assert 0x8002 >> 1 == 0x4001
    assert _rev15(0x4001) == 0x4001          # palindromic mask

    # reversal conjugation: left-shift LFSR(g, v0) emits the same bits as
    # right-shift LFSR(rev g, rev v0) -- proven exhaustively for the
    # whole 2^15-1 period, not just the 120-bit window
    n = (1 << 15) - 1
    left = _lfsr_left(0x4001, 0x4D4B, n)
    right = _lfsr_right(_rev15(0x4001), _rev15(0x4D4B), n)
    assert left == right

    # the committed sequence is that sequence's first 120 bits
    assert list(seq.scrambler_bits()) == left[:120]

    # and it is a maximal-length sequence: the register returns to the
    # seed after exactly 2^15-1 steps and never earlier
    v = 0x4D4B
    seen_at = None
    for i in range(n):
        b = bin(v & 0x4001).count('1') & 1
        v = ((v << 1) | b) & 0x7FFF
        if v == 0x4D4B:
            seen_at = i + 1
            break
    assert seen_at == n
