"""Generate the per-module API reference into docs/api/.

Counterpart of the reference's Sphinx `docs/mpyc.rst` + `docs/pydocs/`
pages (/root/reference/docs/mpyc.rst:1-95): one markdown page per public
module, listing every public class (with its public methods/properties)
and function, signatures and docstrings taken from the source.

Usage: python tools/gen_api_docs.py            # writes docs/api/*.md
"""
import importlib
import inspect
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, 'docs', 'api')

MODULES = [
    ('mpyc_tpu', 'package init: CLI/env setup, compile-cache control'),
    ('mpyc_tpu.runtime', 'the protocol runtime (the `mpc` object)'),
    ('mpyc_tpu.sectypes', 'secure type system (SecFld/SecInt/SecFxp/'
                          'SecFlt + arrays)'),
    ('mpyc_tpu.finfields', 'finite fields GF(p), GF(p^d), GF(2^d) + '
                           'arrays'),
    ('mpyc_tpu.gfpx', 'polynomial arithmetic over GF(p)'),
    ('mpyc_tpu.gmpy', 'bignum layer (primality, powmod, ratrec)'),
    ('mpyc_tpu.thresha', 'Shamir secret sharing + PRSS'),
    ('mpyc_tpu.asyncoro', 'asyncoro compatibility shim'),
    ('mpyc_tpu.fingroups', 'finite groups (symmetric, QR, Schnorr, '
                           'elliptic/hyperelliptic curves, class groups)'),
    ('mpyc_tpu.secgroups', 'secure group arithmetic + secure '
                           'exponentiation'),
    ('mpyc_tpu.seclists', 'oblivious lists (secret-indexed access)'),
    ('mpyc_tpu.secpols', 'secure polynomials'),
    ('mpyc_tpu.random', 'secure randomness (choice/shuffle/sample/...)'),
    ('mpyc_tpu.statistics', 'secure statistics (mean/median/regression)'),
    ('mpyc_tpu.mpctools', 'log-depth reduce/accumulate'),
    ('mpyc_tpu.numpy', 'numpy shim / shape inference helpers'),
    ('mpyc_tpu.ops.fieldops', 'prime-field Montgomery kernel contexts'),
    ('mpyc_tpu.ops.limb', 'uint32-limb modular arithmetic kernels'),
    ('mpyc_tpu.ops.binary', 'packed GF(2^d) kernels'),
    ('mpyc_tpu.ops.extension', 'GF(p^d) coefficient-stack kernels'),
    ('mpyc_tpu.ops.keccak', 'Keccak-f[1600] / SHAKE128 kernels'),
    ('mpyc_tpu.ops.rng', 'counter-mode SHAKE randomness'),
    ('mpyc_tpu.ops.hostfield', 'native C host-plane field kernels'),
    ('mpyc_tpu.ops.native_modexp', 'native batched modexp'),
    ('mpyc_tpu.models.pipelines', 'fused whole-protocol device programs'),
    ('mpyc_tpu.parallel.exchange', 'asyncio TCP mesh transport'),
    ('mpyc_tpu.parallel.cpp_exchange', 'native epoll transport bindings'),
    ('mpyc_tpu.parallel.simulator', 'co-located m-party simulator plane'),
    ('mpyc_tpu.parallel.scaling', 'batch-axis scaling harness'),
    ('mpyc_tpu.utils.lazyjax', 'deferred jax import layer'),
    ('mpyc_tpu.utils.tracecache', 'persistent jax.export trace cache'),
    ('mpyc_tpu.utils.certs', 'TLS certificate layout helpers'),
]


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return '(...)'


def _doc(obj, indent=''):
    d = inspect.getdoc(obj)
    if not d:
        return ''
    return '\n'.join(indent + line for line in d.splitlines())


def _is_public(name):
    return not name.startswith('_')


def document_module(modname, hook):
    mod = importlib.import_module(modname)
    lines = [f'# `{modname}`', '', f'*{hook}*', '']
    mdoc = inspect.getdoc(mod)
    if mdoc:
        lines += [mdoc, '']
    funcs, classes = [], []
    for name, obj in sorted(vars(mod).items()):
        if not _is_public(name):
            continue
        if inspect.isclass(obj) and obj.__module__ == modname:
            classes.append((name, obj))
        elif (inspect.isfunction(obj) or inspect.isbuiltin(obj)) and \
                getattr(obj, '__module__', None) == modname:
            funcs.append((name, obj))
    if funcs:
        lines += ['## Functions', '']
        for name, fn in funcs:
            lines += [f'### `{name}{_sig(fn)}`', '']
            d = _doc(fn)
            if d:
                lines += [d, '']
    if classes:
        lines += ['## Classes', '']
        for name, cls in classes:
            lines += [f'### `class {name}`', '']
            d = _doc(cls)
            if d:
                lines += [d, '']
            for mname, mobj in sorted(vars(cls).items()):
                if not _is_public(mname):
                    continue
                if inspect.isfunction(mobj):
                    lines += [f'- **`{mname}{_sig(mobj)}`**']
                    md = inspect.getdoc(mobj)
                    if md:
                        first = md.splitlines()[0]
                        lines += [f'  — {first}']
                elif isinstance(mobj, property):
                    md = inspect.getdoc(mobj)
                    first = f' — {md.splitlines()[0]}' if md else ''
                    lines += [f'- **`{mname}`** *(property)*{first}']
            lines += ['']
    return '\n'.join(lines) + '\n'


def main():
    os.makedirs(OUT, exist_ok=True)
    index = ['# mpyc_tpu API reference', '',
             'Generated from docstrings by `tools/gen_api_docs.py` '
             '(run it after changing public APIs).', '',
             '| module | summary |', '|---|---|']
    for modname, hook in MODULES:
        fname = modname.replace('.', '_') + '.md'
        try:
            text = document_module(modname, hook)
        except Exception as exc:
            print(f'skip {modname}: {exc}', file=sys.stderr)
            continue
        with open(os.path.join(OUT, fname), 'w') as fh:
            fh.write(text)
        index.append(f'| [`{modname}`]({fname}) | {hook} |')
        print(f'wrote docs/api/{fname}')
    with open(os.path.join(OUT, 'README.md'), 'w') as fh:
        fh.write('\n'.join(index) + '\n')
    print('wrote docs/api/README.md')


if __name__ == '__main__':
    main()
