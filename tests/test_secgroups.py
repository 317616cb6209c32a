"""Tests for secure groups (reference surface: mpyc/secgroups.py,
coverage modeled on tests/test_secgroups.py)."""

import operator

import pytest

from mpyc_tpu.runtime import mpc
from mpyc_tpu import fingroups as fg


@pytest.fixture(scope='module', autouse=True)
def _mpc():
    mpc.run(mpc.start())
    yield
    mpc.run(mpc.shutdown())


def out(x):
    return mpc.run(mpc.output(x))


def test_symmetric():
    group = fg.SymmetricGroup(5)
    a = group([3, 4, 2, 1, 0])
    b = a @ a
    secgrp = mpc.SecGrp(group)
    c = secgrp(a)
    assert out(a @ c) == b
    f = ~c @ b
    assert out(f) == a
    assert int(out(f == c)) == 1
    with pytest.raises(TypeError):
        c + c
    with pytest.raises(TypeError):
        c * c
    with pytest.raises(ValueError):
        secgrp([0, 1, 2, 3])


def test_symmetric_repeat():
    group = fg.SymmetricGroup(5)
    secgrp = mpc.SecGrp(group)
    a = group([1, 2, 3, 4, 0])  # order 5
    secfld = mpc.SecFld(5)
    a3 = secgrp.repeat(a, secfld(3))
    assert out(a3) == a^3
    assert secgrp.repeat_public(a, secfld(3)) == a^3
    assert out(secgrp(a^2).inverse()) == a^3
    assert out((secgrp(a)^2) @ secgrp.identity) == a^2


def test_qr_sg():
    for group in (fg.QuadraticResidues(11), fg.SchnorrGroup(11, 5, 4)):
        secgrp = mpc.SecGrp(group)
        g = group.generator
        g2 = out(secgrp(g) * g)
        assert int(out(g * secgrp(g) == g2)) == 1
        assert int(out(secgrp(g)/g != group.identity)) == 0
        secfld = mpc.SecFld(modulus=group.order)
        assert out(secgrp.repeat(g, -secfld(2))) == 1/(g2)
        assert out(secgrp.repeat(secgrp(g), 2)) == g2
        h = secgrp.if_else(secgrp.sectype(0), g, secgrp(g2))
        assert out(h) == g2
        a = secgrp(g)
        with pytest.raises(TypeError):
            2 / a
        with pytest.raises(TypeError):
            a + a
        with pytest.raises(TypeError):
            -a


def test_qr_encode_decode():
    group = fg.QuadraticResidues(11)
    secgrp = mpc.SecGrp(group)
    m, z = group.encode(2)
    assert int(out(secgrp.decode(secgrp(m), secgrp(z), gap=group.gap))) == 2


EC_CASES = ['Ed25519/affine', 'Ed25519/projective', 'Ed25519/extended',
            'Ed448/projective', 'secp256k1/projective', 'BN256/projective']


@pytest.mark.parametrize('spec', EC_CASES)
def test_elliptic(spec):
    curvename, coords = spec.split('/')
    group = fg.EllipticCurve(curvename, coords)
    secgrp = mpc.SecGrp(group)
    secfld = mpc.SecFld(modulus=group.order)
    g = group.generator
    assert int(out(secgrp(g) != g)) == 0
    b = secgrp(g.value)
    assert out(b - b) == group.identity
    assert secgrp.repeat_public(g, -secfld(2)) == g^-2
    assert out(secfld(2)*g) == g^2
    assert out(2*secgrp(g)) == g^2
    bp4 = 4*g
    sec_bp4 = 4*secgrp(g) + secgrp.identity
    assert out(-sec_bp4) == -bp4
    assert out(secgrp.repeat(bp4, secfld(2))) == bp4 + bp4
    assert out(group.identity + b) == g
    assert out(g - b) == group.identity
    m, z = group.encode(42)
    assert int(out(secgrp.decode(secgrp(m), secgrp(z)))) == 42
    with pytest.raises(TypeError):
        sec_bp4 * 13
    with pytest.raises(TypeError):
        sec_bp4 / sec_bp4
    with pytest.raises(ValueError):
        secgrp([0])


def test_hyperelliptic_cl():
    group = fg.HyperellipticCurve('kummer1271')
    secgrp = mpc.SecGrp(group)
    secfld = mpc.SecFld(modulus=group.order)
    g = group.generator
    assert int(out(secgrp(g) != g)) == 0
    assert out(secfld(2)*g) == g^2
    assert out(2*secgrp(g)) == g^2
    bp4 = 4*g
    assert out(secgrp.repeat(bp4, secfld(2))) == bp4 + bp4
    assert secgrp.repeat_public(g, -secfld(2)) == g^-2


def test_hyperelliptic_cantor():
    group = fg.HyperellipticCurve(p=1231, genus=2)
    secgrp = mpc.SecGrp(group)
    g = group.generator
    assert out(secgrp(g) @ secgrp(g)) == g @ g
    assert out(~secgrp(g)) == ~g
    assert out(secgrp(g) @ secgrp(~g)) == group.identity


def test_class_groups():
    Cl23 = fg.ClassGroup(Delta=-23)
    secgrp = mpc.SecGrp(Cl23)
    secint = secgrp.sectype
    g = Cl23.generator
    assert int(out(secgrp(g) != g)) == 0
    assert secgrp.repeat_public(g, -secint(2)) == g
    assert out(g**secint(-2)) == g
    assert out(g * secgrp(g)) == Cl23((2, -1, 3))

    Cl227 = fg.ClassGroup(Delta=-227)
    secgrp = mpc.SecGrp(Cl227)
    g = Cl227((3, 1, 19))
    assert out(secgrp(g)^5) == g^5

    group = fg.ClassGroup(l=28)
    secgrp = mpc.SecGrp(group)
    g = group.generator
    a = secgrp(g)^6
    assert out(a) == g^6
    m, z = group.encode(5)
    assert int(out(secgrp.decode(secgrp(m), secgrp(z)))) == 5
    with pytest.raises(ValueError):
        secgrp([0])


def test_io():
    group = fg.EllipticCurve('Ed25519', 'extended')
    secgrp = mpc.SecGrp(group)
    g = group.generator
    x = mpc.input(secgrp(g), senders=0)
    assert out(x) == g
