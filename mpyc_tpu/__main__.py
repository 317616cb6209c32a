"""Interactive REPL with the MPyC-TPU runtime preloaded.

Run:

    python -m mpyc_tpu [-M m] [...]

Counterpart of the reference's ``python -m mpyc`` REPL
(reference mpyc/__main__.py:1-205). The reference needs an asyncio console
so users can ``await`` protocol coroutines at the top level; this runtime
is eager — every op returns a finished secure object — so a plain console
suffices and ``mpc.run()`` stays a no-op pass-through for compatibility.

The same handles are predefined:

    from mpyc_tpu.runtime import mpc
    secint = mpc.SecInt()
    secfxp = mpc.SecFxp()
    secflt = mpc.SecFlt()
    secfld127 = mpc.SecFld(127)
    secfld256 = mpc.SecFld(2**8)
    secsym = mpc.SecSymmetricGroup(5)
    secqr = mpc.SecQuadraticResidues(11)
    secsg = mpc.SecSchnorrGroup(l=1024)
    secec = mpc.SecEllipticCurve('Ed25519')
    sechc = mpc.SecHyperellipticCurve('kummer1271')
    seccl = mpc.SecClassGroup(-23)
"""

import code
import sys

PREAMBLE = (
    'from mpyc_tpu.runtime import mpc',
    'secint = mpc.SecInt()',
    'secfxp = mpc.SecFxp()',
    'secflt = mpc.SecFlt()',
    'secfld127 = mpc.SecFld(127)',
    'secfld256 = mpc.SecFld(2**8)',
    'secsym = mpc.SecSymmetricGroup(5)',
    'secqr = mpc.SecQuadraticResidues(11)',
    'secsg = mpc.SecSchnorrGroup(l=1024)',
    "secec = mpc.SecEllipticCurve('Ed25519')",
    "sechc = mpc.SecHyperellipticCurve('kummer1271')",
    'seccl = mpc.SecClassGroup(-23)',
)


def main(preamble=PREAMBLE):
    try:
        import readline  # noqa: F401  (line editing if available)
    except ImportError:
        pass
    console = code.InteractiveConsole()
    prompt = getattr(sys, 'ps1', '>>> ')
    input_lines = ''.join(f'\n{prompt}{line}' for line in preamble)
    banner = (f'MPyC-TPU REPL {sys.version} on {sys.platform}\n'
              f'Type "help", "copyright", "credits" or "license" '
              f'for more information.'
              f'{input_lines}')
    for line in preamble:
        console.push(line)
    console.interact(banner=banner, exitmsg='exiting MPyC-TPU REPL...')


if __name__ == '__main__':
    main()
