"""Oracle parity: run the reference framework's own unit tests against
mpyc_tpu via module aliasing (no code copied — the reference tests load
from /root/reference and drive our implementation through the mpyc API).

Covered suites: test_gmpy, test_gfpx, test_thresha, test_finfields,
test_fingroups, test_mpctools, test_sectypes, test_asyncoro, test_numpy —
the pure-math layers where the reference's behavior is the bit-exact
contract (SURVEY.md §4) — plus the full runtime/extension suites behind
MPYC_TPU_FULL_ORACLE (tens of minutes).
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
                'sectypes', 'mpctools', 'numpy', 'runtime', 'asyncoro',
                'seclists', 'secpols', 'secgroups', 'random', 'statistics']:
        sys.modules[f'mpyc.{sub}'] = __import__(f'mpyc_tpu.{sub}',
                                                fromlist=[sub])
    sys.path.insert(0, REFERENCE_TESTS)
    yield
    sys.path.remove(REFERENCE_TESTS)
    for k in [k for k in sys.modules if k == 'mpyc' or k.startswith('mpyc.')]:
        del sys.modules[k]
    sys.modules.update({k: v for k, v in saved.items() if v is not None})


def _run(name):
    # Our own tests/ may contain a same-named pytest module already loaded
    # by collection (e.g. tests/test_gmpy.py); evict it so the reference
    # suite is imported from REFERENCE_TESTS, then restore it afterwards.
    shadowed = sys.modules.pop(name, None)
    try:
        mod = __import__(name)
        suite = unittest.defaultTestLoader.loadTestsFromModule(mod)
        result = unittest.TestResult()
        suite.run(result)
        msgs = [t[1][-500:] for t in result.failures + result.errors]
        assert not msgs, f'{name}: {len(msgs)} failing:\n' + '\n'.join(msgs)
        assert result.testsRun > 0
    finally:
        sys.modules.pop(name, None)
        if shadowed is not None:
            sys.modules[name] = shadowed


@pytest.mark.slow
@pytest.mark.parametrize('name', ['test_gmpy', 'test_gfpx', 'test_thresha',
                                  'test_fingroups', 'test_mpctools',
                                  'test_sectypes', 'test_asyncoro',
                                  'test_numpy', 'test_finfields',
                                  'test_runtime'])
def test_reference_suite(alias_mpyc, name):
    # test_runtime is the strongest correctness oracle and runs by default
    # (round-2 lesson: gating it shipped two silent regressions).
    _run(name)


# The remaining extension suites take tens of minutes in total; they run
# when explicitly requested (and before every snapshot).
@pytest.mark.slow
@pytest.mark.skipif(not os.getenv('MPYC_TPU_FULL_ORACLE'),
                    reason='set MPYC_TPU_FULL_ORACLE=1 for the full '
                           'reference oracle (tens of minutes)')
@pytest.mark.parametrize('name', ['test_seclists',
                                  'test_secpols', 'test_random',
                                  'test_statistics', 'test_secgroups'])
def test_reference_suite_full(alias_mpyc, name):
    _run(name)
