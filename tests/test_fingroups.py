"""Tests for finite groups (reference surface: mpyc/fingroups.py,
test strategy modeled on tests/test_fingroups.py)."""

import operator

import pytest

from mpyc_tpu import fingroups as fg


def test_group_caching():
    assert fg.SymmetricGroup(3) is fg.SymmetricGroup(3)
    assert fg.QuadraticResidues(11) is fg.QuadraticResidues(l=4)
    assert fg.ClassGroup(Delta=-23) is fg.ClassGroup(l=5)


def test_symmetric():
    S0 = fg.SymmetricGroup(0)
    assert S0.order == 1
    p = S0.identity
    assert p^2 == p
    with pytest.raises(TypeError):
        p + p
    with pytest.raises(TypeError):
        p * p
    with pytest.raises(TypeError):
        1 * p

    S3 = fg.SymmetricGroup(3)
    assert S3.degree == 3 and S3.order == 6
    assert S3.identity == S3([0, 1, 2])
    p = S3([1, 2, 0])
    assert p^0 == S3.identity and p^3 == S3.identity
    q = S3([1, 0, 2])
    assert q @ q == S3.identity
    assert q == ~q
    assert p @ q == S3([0, 2, 1])
    assert q @ p == S3([2, 1, 0])
    assert {p, q, q} == {p, p, q}
    with pytest.raises(ValueError):
        S3([1, 2])
    with pytest.raises(ValueError):
        S3([1, 2, 3])


def test_qr_sg():
    QR11 = fg.QuadraticResidues(11)
    SG11 = fg.SchnorrGroup(11, 5, 4)
    for group in (QR11, SG11):
        assert group.order == 5
        assert group.is_cyclic
        assert group.identity == group(1)
        a, b = group(3), group(4)
        assert a^5 == group.identity and b^5 == group.identity
        assert a * b == group.identity
        assert 1/a == b
        assert a / b == a**2
        with pytest.raises(TypeError):
            2 / a
        with pytest.raises(TypeError):
            a + b
        with pytest.raises(TypeError):
            -a
        with pytest.raises(TypeError):
            group(1.0)
        with pytest.raises(ValueError):
            group(0)
        with pytest.raises(ValueError):
            group(2)
        assert {a, b, b} == {a, a, b}

    with pytest.raises(ValueError):
        fg.QuadraticResidues(2)


def test_qr_ike_prime_encode_decode():
    QR = fg.QuadraticResidues(l=768)
    # RFC 2409 Oakley group 1 modulus (pi-derived safe prime)
    assert QR.field.modulus >> 704 == (1 << 64) - 1
    assert QR.field.modulus % 4 == 3
    assert QR.decode(*QR.encode(42)) == 42


def test_sg_mersenne_encode_decode():
    SG = fg.SchnorrGroup(q=2**31 - 1)
    assert SG.order == 2**31 - 1
    assert SG.decode(*SG.encode(42)) == 42


EC_CASES = [('Ed25519', 'affine'), ('Ed25519', 'projective'), ('Ed25519', 'extended'),
            ('Ed448', 'affine'), ('Ed448', 'projective'),
            ('secp256k1', 'affine'), ('secp256k1', 'projective'), ('secp256k1', 'jacobian'),
            ('BN256', 'affine'), ('BN256', 'projective'), ('BN256', 'jacobian'),
            ('BN256_twist', 'projective')]


@pytest.mark.parametrize('curvename,coordinates', EC_CASES)
def test_elliptic_curves(curvename, coordinates):
    group = fg.EllipticCurve(curvename, coordinates)
    assert 5*group.identity == group.identity^-1
    g = group.generator
    assert group(g.value) == g
    assert (g^12) - 13*g == -g
    assert ~-g == g
    assert g - g == group.identity
    assert group.order*g == group.identity
    assert {g, -g, -g} == {g, g, -g}
    if curvename != 'BN256_twist':
        assert group.decode(*group.encode(42)) == 42
    with pytest.raises(TypeError):
        g * 13
    with pytest.raises(TypeError):
        g / g
    with pytest.raises(TypeError):
        1 / g
    with pytest.raises(TypeError):
        g**1
    with pytest.raises(ValueError):
        group((0, 0))


def test_elliptic_curve_generators():
    # known public base points pin down curve constant handling
    g = fg.EllipticCurve('secp256k1').generator
    assert int(g.value[0]) == int(
        '79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798', 16)
    g = fg.EllipticCurve('Ed25519').generator
    assert int(g.value[0]) == int(
        '216936D3CD6E53FEC0A4E231FDD6DC5C692CC7609525A7B2C9562D608F25D51A', 16)
    with pytest.raises(ValueError):
        fg.EllipticCurve('Ed25519', 'jacobian')
    with pytest.raises(ValueError):
        fg.EllipticCurve('BN256', 'extended')


def test_hyperelliptic():
    curves = (fg.HyperellipticCurve(p=3, genus=0),
              fg.HyperellipticCurve(p=7, genus=1),
              fg.HyperellipticCurve(curvename='kummer1271'),
              fg.HyperellipticCurve(l=96, genus=2, coordinates='extended'))
    for group in curves:
        assert 5*group.identity == group.identity^-1
        assert group.generator + (group.generator^-1) == group.identity
        if group.field.modulus > group.gap:
            assert group.decode(*group.encode(42)) == 42
    for group in curves[:3]:
        assert group.generator^group.order == group.identity


def test_hyperelliptic_cl_vs_cantor():
    """CL extended formulas must agree with the generic Cantor fallback."""
    ext = fg.HyperellipticCurve(curvename='kummer1271')
    g = ext.generator
    for n in (3, 17, 12345, 2**40 + 5):
        D1, D2 = g^n, g^(n + 7)
        via_cl = ext.operation(D1, D2)
        via_cantor = ext(ext._cantor_fallback(ext._compose, (D1, D2)), check=False)
        assert [int(c) for c in via_cl.value] == [int(c) for c in via_cantor.value]
        dbl_cl = ext.operation2(D1)
        dbl_cantor = ext(ext._cantor_fallback(ext._compose2, (D1,)), check=False)
        assert [int(c) for c in dbl_cl.value] == [int(c) for c in dbl_cantor.value]


def test_class_groups():
    Cl3 = fg.ClassGroup()  # trivial group, D=-3
    g = Cl3((1, 1, 1))
    assert g * (1 / g) @ g^2 == Cl3.identity
    assert {g, 1/g, 1/g} == {g, g, 1/g}

    Cl23 = fg.ClassGroup(Delta=-23)
    assert Cl23.order == 3
    assert Cl23.is_multiplicative
    g = Cl23.generator
    assert g == Cl23((2, 1, 3))
    assert g * g == Cl23((2, -1))
    assert (g^2) @ g == Cl23.identity
    assert g @ g.inverse() == Cl23.identity

    Cl227 = fg.ClassGroup(Delta=-227)  # h(-227) = 5
    assert Cl227.order == 5
    assert Cl227((1, 1, 57)) == Cl227.identity
    g = Cl227((3, 1, 19))
    assert g^5 == Cl227.identity

    Cl1123 = fg.ClassGroup(Delta=-1123)
    assert Cl1123((1, 1, 281)) == Cl1123.identity
    g = Cl1123((7, 5, 41))
    assert g^5 == Cl1123.identity
    assert g^3 == Cl1123((17, 13, 19))
    with pytest.raises(ValueError):
        Cl23((1, 1, 2))
    with pytest.raises(ValueError):
        Cl23((2, 2, 2))

    Cl16 = fg.ClassGroup(l=16)
    a = (Cl16.generator^10000)^128
    assert a @ (a^-1) == Cl16.identity

    Cl32 = fg.ClassGroup(l=32)
    assert Cl32.generator^20021 == Cl32.identity
    assert Cl32.decode(*Cl32.encode(24)) == 24

    for bad in (-13, 13, -12):
        with pytest.raises(ValueError):
            fg.ClassGroup(bad)
    with pytest.raises(ValueError):
        Cl23((-2, 1, -3))


def test_gfpx_deriv():
    from mpyc_tpu.gfpx import GFpX
    P = GFpX(7)
    f = P([3, 1, 0, 2])            # 2x^3 + x + 3
    assert list(f.deriv()) == [1, 0, 6]
    B = GFpX(2)
    g = B('x^5+x^4+x^2+1')
    assert int(g.deriv()) == int(B('x^4'))
    assert int(B(0).deriv()) == 0
