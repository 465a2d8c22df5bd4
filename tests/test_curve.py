"""GF(p^5), EcGFp5 and SSWU: algebraic laws + reference golden vectors.

The SSWU input/output vectors below are the reference's published test values
(/root/reference/mp2-common/src/group_hashing/sswu_value.rs:85-121), which pin
down bit-exactness of GF(p^5) arithmetic, Tonelli-Shanks sqrt, sgn0, and the
curve constants.
"""

import random

import pytest

from mp2_tpu.field import ecgfp5, gfp5, sswu
from mp2_tpu.field.ecgfp5 import NEUTRAL, Point
from mp2_tpu.field.goldilocks import P

rng = random.Random(42)


def rand_quint():
    return tuple(rng.randrange(P) for _ in range(5))


# --- GF(p^5) ---------------------------------------------------------------


def test_gfp5_ring_axioms():
    for _ in range(10):
        a, b, c = rand_quint(), rand_quint(), rand_quint()
        assert gfp5.mul(a, b) == gfp5.mul(b, a)
        assert gfp5.mul(a, gfp5.mul(b, c)) == gfp5.mul(gfp5.mul(a, b), c)
        assert gfp5.mul(a, gfp5.add(b, c)) == gfp5.add(
            gfp5.mul(a, b), gfp5.mul(a, c)
        )


def test_gfp5_inv():
    for _ in range(10):
        a = rand_quint()
        assert gfp5.mul(a, gfp5.inv(a)) == gfp5.ONE
    assert gfp5.inv(gfp5.ZERO) == gfp5.ZERO


def test_gfp5_frobenius():
    for _ in range(5):
        a = rand_quint()
        assert gfp5.frobenius(a) == gfp5.pow_int(a, P)
        # frob^5 = id
        b = a
        for _ in range(5):
            b = gfp5.frobenius(b)
        assert b == a


def test_gfp5_sqrt():
    for _ in range(10):
        a = rand_quint()
        sq = gfp5.square(a)
        assert gfp5.is_square(sq)
        r = gfp5.sqrt(sq)
        assert r is not None and gfp5.square(r) == sq
    # a known non-square: 7 (non-residue in GF(p), odd-degree extension)
    assert not gfp5.is_square(gfp5.from_base(7))
    assert gfp5.sqrt(gfp5.from_base(7)) is None


# --- curve constants vs reference-published values --------------------------


def test_sw_constants_match_reference():
    # /root/reference/mp2-common/src/group_hashing/utils.rs
    assert ecgfp5.TWO_THIRDS == (6148914689804861441, 0, 0, 0, 0)
    assert ecgfp5.A_SW == (6148914689804861439, 263, 0, 0, 0)
    assert ecgfp5.B_SW == (15713893096167979237, 6148914689804861265, 0, 0, 0)
    assert sswu.Z_SW == (P - 4, P - 1, 0, 0, 0)
    assert sswu.NEG_Z_INV_SW == (
        4795794222525505369,
        3412737461722269738,
        8370187669276724726,
        7130825117388110979,
        12052351772713910496,
    )
    assert sswu.NEG_B_DIV_A_SW == (
        6585749426319121644,
        16990361517133133838,
        3264760655763595284,
        16784740989273302855,
        13434657726302040770,
    )


# --- SSWU golden vectors ----------------------------------------------------

SSWU_VECTORS = [
    (
        (1, 2, 3, 4, 5),
        (
            14787531356491256379,
            11461637202037498289,
            4291527673026618528,
            4746471857872952759,
            13337224262829952359,
        ),
    ),
    (
        (100, 100, 100, 100, 100),
        (
            5101977855671705567,
            18259369900233540211,
            4964766086423821262,
            6349865835816149910,
            13164635315267603389,
        ),
    ),
    (
        (0, 2**64 - 1, 0, 2**64 - 1, 2**64 - 1),
        (
            15406267945121757331,
            8614084671648873762,
            2366015382156010603,
            14529344599099006840,
            15466818755358183082,
        ),
    ),
]


@pytest.mark.parametrize("inp,out", SSWU_VECTORS)
def test_sswu_golden(inp, out):
    u = tuple(v % P for v in inp)
    pt = sswu.simple_swu(u)
    assert pt.is_valid()
    assert pt.encode() == out


# --- group law --------------------------------------------------------------


def rand_point():
    return sswu.simple_swu(rand_quint())


def test_group_laws():
    a, b, c = rand_point(), rand_point(), rand_point()
    assert (a + b) == (b + a)
    assert ((a + b) + c) == (a + (b + c))
    assert (a + NEUTRAL) == a
    assert (a - a) == NEUTRAL
    assert (a + (-a)) == NEUTRAL
    for p in (a, b, c, a + b, a + b + c):
        assert p.is_valid()


def test_double_and_scalar_mul():
    a = rand_point()
    assert a.double() == a + a
    assert a.scalar_mul(0) == NEUTRAL
    assert a.scalar_mul(1) == a
    assert a.scalar_mul(5) == a + a + a + a + a
    k1, k2 = rng.randrange(1 << 128), rng.randrange(1 << 128)
    assert a.scalar_mul(k1) + a.scalar_mul(k2) == a.scalar_mul(k1 + k2)


def test_encode_decode_roundtrip():
    for _ in range(5):
        a = rand_point()
        w = a.encode()
        assert Point.decode(w) == a
    assert Point.decode(gfp5.ZERO) == NEUTRAL
    assert NEUTRAL.encode() == gfp5.ZERO


def test_weierstrass_roundtrip():
    a = rand_point()
    fields = a.to_fields()
    assert len(fields) == 11 and fields[10] == 0
    assert Point.from_fields(fields) == a
    nf = NEUTRAL.to_fields()
    assert nf[10] == 1
    assert Point.from_fields(nf) == NEUTRAL


def test_digest_accumulator_order_agnostic():
    pts = [rand_point() for _ in range(6)]
    d1 = ecgfp5.add_points(pts)
    shuffled = pts[:]
    rng.shuffle(shuffled)
    d2 = ecgfp5.add_points(shuffled)
    assert d1 == d2 and d1.is_valid()
