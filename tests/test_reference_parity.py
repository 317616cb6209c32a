"""Oracle parity: run the reference framework's own unit tests against
mpyc_tpu via module aliasing (no code copied — the reference tests load
from /root/reference and drive our implementation through the mpyc API).

Covered suites: test_gmpy, test_gfpx, test_thresha, test_fingroups,
test_mpctools — the pure-math layers where the reference's behavior is the
bit-exact contract (SURVEY.md §4).  The finfields/sectypes/runtime suites
are not included: they pin numpy object-dtype internals (element-returning
scalar indexing, in-place views) that the TPU build deliberately replaces
with device arrays (docs/design.md).
"""
import os
import sys
import unittest

import pytest

REFERENCE_TESTS = '/root/reference/tests'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_TESTS),
    reason='reference checkout not available')


@pytest.fixture(scope='module')
def alias_mpyc():
    import mpyc_tpu
    saved = {k: sys.modules.get(k) for k in list(sys.modules)
             if k == 'mpyc' or k.startswith('mpyc.')}
    sys.modules['mpyc'] = mpyc_tpu
    for sub in ['finfields', 'gfpx', 'gmpy', 'thresha', 'fingroups',
                'sectypes', 'mpctools', 'numpy']:
        sys.modules[f'mpyc.{sub}'] = __import__(f'mpyc_tpu.{sub}',
                                                fromlist=[sub])
    sys.path.insert(0, REFERENCE_TESTS)
    yield
    sys.path.remove(REFERENCE_TESTS)
    for k in [k for k in sys.modules if k == 'mpyc' or k.startswith('mpyc.')]:
        del sys.modules[k]
    sys.modules.update({k: v for k, v in saved.items() if v is not None})


def _run(name):
    mod = __import__(name)
    try:
        suite = unittest.defaultTestLoader.loadTestsFromModule(mod)
        result = unittest.TestResult()
        suite.run(result)
        msgs = [t[1][-500:] for t in result.failures + result.errors]
        assert not msgs, f'{name}: {len(msgs)} failing:\n' + '\n'.join(msgs)
        assert result.testsRun > 0
    finally:
        sys.modules.pop(name, None)


@pytest.mark.slow
@pytest.mark.parametrize('name', ['test_gmpy', 'test_gfpx', 'test_thresha',
                                  'test_fingroups', 'test_mpctools'])
def test_reference_suite(alias_mpyc, name):
    _run(name)
