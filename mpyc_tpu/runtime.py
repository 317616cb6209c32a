"""MPC runtime: the ``mpc`` object coordinating parties and protocol ops.

Capability parity target: /root/reference/mpyc/runtime.py (class Runtime).
TPU-first execution model (SURVEY.md §7 design delta 2): protocol ops run as
explicit eager rounds — local jitted device kernels separated by pc-tagged
share exchanges — instead of the reference's asyncio dataflow futures. The
program counter discipline survives as a deterministic round counter used
for message tags and PRSS unique common inputs (asyncoro.py:276-309).

Secure values hold device field arrays; all local math in a round is batched
jitted limb arithmetic. Communication backends:
  * loopback (m == 1): no transport;
  * TCP full mesh (one process per party), wire format compatible in spirit
    with the reference framing (asyncoro.py:54-64);
  * co-located simulator (all parties' shares stacked on a leading party
    axis; exchanges become array permutations / mesh collectives) — see
    mpyc_tpu/parallel/simulator.py.
"""

from __future__ import annotations

import functools
import inspect
import itertools
import logging
import math
import os
import secrets
import sys
import time
from dataclasses import dataclass

import numpy as np
from mpyc_tpu.utils import lazyjax as _lazyjax
from mpyc_tpu.utils.lazyjax import jnp

from mpyc_tpu import finfields, gfpx, sectypes, thresha
from mpyc_tpu import asyncoro
from mpyc_tpu.ops import rng as rng_mod

logger = logging.getLogger(__name__)


@dataclass
class Party:
    """Information about one MPC party."""
    pid: int
    host: str = None
    port: int = None
    protocol = None  # per-peer MessageExchanger (reference runtime.py:5051)

    def __repr__(self):
        if self.host is None:
            return f'<Party {self.pid}>'
        return f'<Party {self.pid}: {self.host}:{self.port}>'


class _Options:
    """Runtime options (subset of the reference CLI surface, docs/cli.rst)."""

    def __init__(self, **kw):
        self.bit_length = kw.get('bit_length', 32)
        self.sec_param = kw.get('sec_param', 30)
        self.threshold = kw.get('threshold', None)
        # MPYC_TPU_NOPRSS mirrors the reference's MPYC_NOPRSS kill-switch
        # (CI config matrix, reference .travis.yml / SURVEY §4)
        self.no_prss = kw.get('no_prss',
                              bool(os.getenv('MPYC_TPU_NOPRSS')))
        self.no_async = kw.get('no_async', True)   # eager rounds by default
        self.base_port = kw.get('base_port', 11365)
        self.ssl = kw.get('ssl', False)
        self.sim = kw.get('sim', False)
        self.output_file = kw.get('output_file', False)


class Runtime:
    """MPC runtime for party pid among parties (eager round execution)."""

    version = '0.1'
    SecureObject = sectypes.SecureObject
    SecureNumber = sectypes.SecureNumber
    SecureFiniteField = sectypes.SecureFiniteField
    SecureInteger = sectypes.SecureInteger
    SecureFixedPoint = sectypes.SecureFixedPoint
    SecureArray = sectypes.SecureArray
    SecureFiniteFieldArray = sectypes.SecureFiniteFieldArray
    SecureIntegerArray = sectypes.SecureIntegerArray
    SecureFixedPointArray = sectypes.SecureFixedPointArray
    SecFld = staticmethod(sectypes.SecFld)
    SecInt = staticmethod(sectypes.SecInt)
    SecFxp = staticmethod(sectypes.SecFxp)
    SecFlt = staticmethod(sectypes.SecFlt)
    SecureFloat = sectypes.SecureFloat
    @staticmethod
    def coroutine(f):
        """Decorator for user-defined MPyC coroutines (reference
        asyncoro.mpc_coro): in the eager plane the coroutine body runs
        synchronously to completion and its result is returned."""
        if not inspect.iscoroutinefunction(f):
            return f

        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            import asyncio
            coro = f(*args, **kwargs)
            try:
                loop = asyncio.get_event_loop()
            except RuntimeError:
                loop = asyncio.new_event_loop()
            return loop.run_until_complete(coro)
        return wrapper

    @staticmethod
    def returnType(*args, **kwargs):
        """Placeholder declaration (reference asyncoro.py:336-375); in the
        eager plane there are no placeholders — awaiting this is a no-op."""
        async def _done():
            return None
        return _done()

    def gather(self, *obj):
        """Resolve secure objects to their local share values (shares are
        concrete in the eager design; reference asyncoro.py:193-273)."""
        def g(x):
            if isinstance(x, sectypes.SecureObject):
                return self._share(x)
            if isinstance(x, (list, tuple)):
                return type(x)(map(g, x))
            return x
        if len(obj) == 1:
            return g(obj[0])
        return tuple(map(g, obj))

    def __init__(self, pid, parties, options):
        self.pid = pid
        self.parties = tuple(parties)
        self.options = options
        self._program_counter = [0]
        self._prss_keys = {}
        self.exchange = None
        self.start_time = None
        self.aggregate_load = 0.0
        self._threshold = None
        self.threshold = options.threshold if options.threshold is not None \
            else (len(parties) - 1) // 2
        self._rng = rng_mod.KeccakRNG()
        self._pipeline = 0
        self._nz_pool = {}  # field modulus -> verified-nonzero random shares
        self._bit_pool = {}  # field modulus -> (bit-share array, offset)

    # -- lifecycle ---------------------------------------------------------

    @property
    def threshold(self):
        """Threshold for MPC."""
        return self._threshold

    @threshold.setter
    def threshold(self, t):
        self._threshold = t
        if getattr(self, '_nz_pool', None):
            self._nz_pool.clear()  # pool entries are t-degree sharings
        if getattr(self, '_bit_pool', None):
            self._bit_pool.clear()
        if self.options.no_prss:
            self._prss_keys = {}
            return
        m = len(self.parties)
        self.prfs.cache_clear()
        keys = {}
        for subset in itertools.combinations(range(m), m - t):
            if subset[0] == self.pid:
                keys[subset] = secrets.token_bytes(16)
        self._prss_keys = keys

    @property
    def _loop(self):
        """Asyncio event loop for reference-style Futures/coroutines."""
        import asyncio
        try:
            return asyncio.get_event_loop()
        except RuntimeError:
            loop = asyncio.new_event_loop()
            asyncio.set_event_loop(loop)
            return loop

    def set_protocol(self, peer_pid, protocol):
        """Register a connection with the given peer (reference
        runtime.py:5031-5035)."""
        self.parties[peer_pid].protocol = protocol
        if all(p.protocol is not None
               for p in self.parties if p.pid != self.pid):
            self.parties[self.pid].protocol.set_result(None)

    def unset_protocol(self, peer_pid):
        """Deregister the connection with the given peer (reference
        runtime.py:5037-5041)."""
        self.parties[peer_pid].protocol = None
        if all(p.protocol is None
               for p in self.parties if p.pid != self.pid):
            self.parties[self.pid].protocol.set_result(None)

    def _prss_keys_to_peer(self, peer_pid):
        """Return own PRSS keys to be sent to the given peer.

        Reference: runtime.py:118-127.
        """
        m = len(self.parties)
        t = self.threshold
        keys = []
        for subset in itertools.combinations(range(m), m - t):
            if subset[0] == self.pid and peer_pid in subset:
                keys.append(self._prss_keys[subset])
        return keys

    def _prss_keys_from_peer(self, peer_pid, data=None):
        """Store PRSS keys received from peer (or return expected size).

        Reference: runtime.py:128-141.
        """
        m = len(self.parties)
        t = self.threshold
        len_packet = 0
        for subset in itertools.combinations(range(m), m - t):
            if subset[0] == peer_pid and self.pid in subset:
                if data is not None:
                    self._prss_keys[subset] = data[len_packet:len_packet + 16]
                len_packet += 16
        return len_packet

    @functools.cache
    def prfs(self, bound):
        """Map from party subsets to device PRFs with codomain range(bound)."""
        return {subset: thresha.DevicePRF(key, bound)
                for subset, key in self._prss_keys.items()}

    def _prss_uci(self):
        """Unique common input for PRSS: increments the program counter."""
        self._program_counter[0] += 1
        return self._program_counter[0].to_bytes(8, 'little', signed=True)

    def _pc_next(self):
        """Next message tag; deterministic across parties."""
        self._program_counter[0] += 1
        return self._program_counter[0]

    def start(self):
        """Start the runtime: connect to all other parties.

        The elapsed-time clock starts once all parties are connected,
        matching the reference's measurement window (its start_time is
        set after the connect loop, runtime.py:297)."""
        self.start_time = time.time()
        m = len(self.parties)
        if m == 1:
            return
        backend = os.getenv('MPYC_TPU_TRANSPORT', 'cpp')
        if getattr(self.options, 'ssl', False):
            backend = 'python'  # TLS lives in the asyncio transport
        if backend == 'cpp':
            from mpyc_tpu.parallel import cpp_exchange
            if cpp_exchange.available():
                self.exchange = cpp_exchange.CppExchange(self)
            else:
                backend = 'python'
        if self.exchange is None or backend == 'python':
            from mpyc_tpu.parallel.exchange import TcpExchange
            self.exchange = TcpExchange(self)
        self.exchange.start()
        logger.info(f'All {m} parties connected.')
        self.start_time = time.time()

    def shutdown(self):
        """Shut down the runtime: close connections, log statistics."""
        self._nz_pool.clear()
        self._bit_pool.clear()
        elapsed = time.time() - (self.start_time or time.time())
        nbytes = self.exchange.nbytes_sent if self.exchange else 0
        logger.info(f'Stop MPyC-TPU -- elapsed time: {elapsed:.4f}s '
                    f'-- bytes sent: {nbytes}')
        if self.exchange is not None:
            self.barrier()
            self.exchange.stop()
            self.exchange = None

    def run(self, obj):
        """Run the given coroutine or return the given (eager) result.

        Kept for API compatibility with the reference's asyncio style:
        ``mpc.run(mpc.output(x))`` works in both frameworks.
        """
        if hasattr(obj, '__await__'):
            import asyncio
            try:
                loop = asyncio.get_event_loop()
            except RuntimeError:
                loop = asyncio.new_event_loop()
            return loop.run_until_complete(obj)
        return obj

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.shutdown()
        return False

    async def __aenter__(self):
        """Start runtime when entering async with context (reference
        runtime.py:328-332)."""
        self.start()
        return self

    async def __aexit__(self, exc_type, exc, tb):
        """Shutdown runtime when exiting async with context (reference
        runtime.py:334-342): limited shutdown (close connections only,
        no barrier) when exiting with an exception."""
        if exc:
            if self.exchange is not None:
                self.exchange.stop()
                self.exchange = None
            return

        self.shutdown()

    def barrier(self, name=None):
        """Synchronization barrier across all parties."""
        if len(self.parties) == 1:
            return
        pc = self._pc_next()
        for peer in range(len(self.parties)):
            if peer != self.pid:
                self.exchange.send(peer, pc, b'')
        for peer in range(len(self.parties)):
            if peer != self.pid:
                self.exchange.receive(peer, pc)

    async def throttler(self, load_percentage=1.0, name=None):
        """Throttle runtime by given percentage (reference runtime.py:173-183).

        In the eager plane there is no dataflow lookahead to bound, so this
        only validates its argument and (at full aggregate load) acts as a
        barrier, keeping parties loosely in step.
        """
        if not 0.0 <= load_percentage <= 1.0:
            raise ValueError('percentage required as decimal fraction between 0.0 and 1.0')

        self.aggregate_load += load_percentage * 10000
        if self.aggregate_load < 10000:
            return

        self.aggregate_load -= 10000
        self.barrier(name=name)

    def pipeline(self):
        """Context manager enabling deferred-receive pipelining.

        Inside ``with mpc.pipeline():`` every resharing round (secure
        multiplications, matmuls, inner products, ...) issues its sends
        immediately but defers its receives: results carry LazyShare
        placeholders, forced transparently on first use (or by
        ``mpc.flush()``).  Independent operations thus overlap their
        network round trips — the eager-rounds counterpart of the
        reference's asyncio dataflow latency hiding (reference
        asyncoro.py:416-464, SURVEY §2.13).  The pc-tagged exchange
        buffers make out-of-order completion safe; nesting is allowed.
        """
        rt = self

        class _Pipeline:
            def __enter__(self):
                rt._pipeline += 1
                return rt

            def __exit__(self, *exc):
                rt._pipeline -= 1
                return False

        return _Pipeline()

    @staticmethod
    def flush(*xs):
        """Force pending pipelined receives of the given secure objects
        (lists/tuples allowed); without arguments this is a no-op, since
        unforced placeholders complete on first use anyway."""
        for x in xs:
            if isinstance(x, (list, tuple)):
                Runtime.flush(*x)
            elif isinstance(x, sectypes.SecureObject):
                x.share  # property read forces any LazyShare
        return xs[0] if len(xs) == 1 else (xs or None)

    def _wire_modules(self):
        """Point the extension modules (random/statistics/seclists/secpols/
        secgroups/mpctools) and the type layer at this runtime instance,
        and expose their public surface as attributes (the reference wires
        its singleton the same way, runtime.py:5203-5212).  Called by
        setup(); test fixtures creating bare Runtime objects call it too.
        """
        rt = self
        sectypes.runtime = rt
        asyncoro.runtime = rt
        import mpyc_tpu
        mpyc_tpu.runtime = rt
        from mpyc_tpu import mpctools as _mpctools
        from mpyc_tpu import random as _random_mod
        from mpyc_tpu import statistics as _statistics
        from mpyc_tpu import seclists as _seclists
        from mpyc_tpu import secpols as _secpols
        from mpyc_tpu import secgroups as _secgroups
        _mpctools.runtime = rt
        _random_mod.runtime = rt
        _statistics.runtime = rt
        _seclists.runtime = rt
        _secpols.runtime = rt
        _secgroups.runtime = rt
        rt.random = _random_mod
        rt.statistics = _statistics
        rt.seclist = _seclists.seclist
        rt.SecGrp = _secgroups.SecGrp
        rt.SecureFiniteGroup = _secgroups.SecureFiniteGroup
        rt.SecSymmetricGroup = _secgroups.SecSymmetricGroup
        rt.SecQuadraticResidues = _secgroups.SecQuadraticResidues
        rt.SecSchnorrGroup = _secgroups.SecSchnorrGroup
        rt.SecEllipticCurve = _secgroups.SecEllipticCurve
        rt.SecHyperellipticCurve = _secgroups.SecHyperellipticCurve
        rt.SecClassGroup = _secgroups.SecClassGroup
        return rt

    def logging(self, enable=None):
        if enable is None:
            enable = logger.getEffectiveLevel() > logging.INFO
        logger.setLevel(logging.INFO if enable else logging.WARNING)

    # -- messaging helpers -------------------------------------------------

    def _send(self, peer, pc, data: bytes):
        self.exchange.send(peer, pc, data)

    def _recv(self, peer, pc, nbytes=None) -> bytes:
        return self.exchange.receive(peer, pc, nbytes=nbytes)

    # -- share bookkeeping -------------------------------------------------

    @staticmethod
    def _share(x):
        """Field array share of a secure object (or pass through field arrays)."""
        if isinstance(x, sectypes.SecureObject):
            return x.share
        return x

    def _share2(self, a, b):
        """Shares of two operands, shape-aligned (sim overrides this)."""
        return self._share(a), self._share(b)

    def _share_scalar_at(self, a, i):
        """Share of element i of 1-D secure array a, as a shape-() share
        (keeps any leading party axis; avoids the element-returning
        public __getitem__)."""
        s = self._share(a)
        idx = (slice(None),) * self._pax + (i,)
        return s.from_data(s.data[idx])

    @staticmethod
    def _sectype(*xs):
        """Scalar sectype of the operands (first secure operand wins)."""
        for x in xs:
            if isinstance(x, sectypes.SecureArray):
                return x.sectype
            if isinstance(x, sectypes.SecureNumber):
                return type(x)
        raise TypeError('no secure operand')

    @staticmethod
    def _is_array_op(*xs):
        return any(isinstance(x, sectypes.SecureArray) for x in xs)

    def _wrap(self, stype, share, array=None, integral=None):
        """Wrap a field-array share into the right secure type."""
        if array is None:
            array = bool(share.shape)
        if array:
            res = stype.array(share)
        else:
            res = stype(share)
        if issubclass(stype, sectypes.SecureFixedPoint):
            res.integral = integral if integral is not None else False
        return res

    @staticmethod
    def _integral(x):
        if isinstance(x, (sectypes.SecureFixedPoint,
                          sectypes.SecureFixedPointArray)):
            return bool(x.integral)
        if isinstance(x, sectypes.SecureObject):
            return True
        if isinstance(x, float):
            return x.is_integer()
        if isinstance(x, np.ndarray):
            if np.issubdtype(x.dtype, np.floating):
                # reference np_multiply: float arrays are never treated
                # integral (runtime.py:1118-1123), so products get a
                # proper truncation
                return False
            if x.dtype == object:
                return all(Runtime._integral(v) for v in x.reshape(-1))
        if isinstance(x, (list, tuple)):
            return all(Runtime._integral(v) for v in x)
        return True

    # -- wire marshaling ---------------------------------------------------

    @staticmethod
    def _marshal(field_arr) -> bytes:
        """Field array -> wire bytes (shape is implicit protocol context)."""
        vals = field_arr.value.reshape(-1)
        return field_arr.field.to_bytes([int(v) for v in vals])

    @staticmethod
    def _unmarshal(field, data: bytes, shape):
        vals = field.from_bytes(data)
        return field.array(np.array(vals, dtype=object).reshape(shape))

    # ======================================================================
    # share I/O: input / output / reshare / transfer / convert
    # ======================================================================

    def input_each(self, f):
        """One secret per party: party i contributes f(i); returns the list
        of m secure values.

        Plane-agnostic way to express "every party inputs its own value":
        on the per-party plane each party evaluates f(its own pid) and
        Shamir-inputs it (one round, like input with senders=None); on the
        co-located simulator plane (--sim) the single program evaluates
        f(i) for every party i, keeping the demo semantics identical.
        """
        if getattr(self, 'is_simulator', False):
            return [self.input(f(i), senders=i)
                    for i in range(len(self.parties))]
        return self.input(f(self.pid))

    def input(self, x, senders=None):
        """Input x to the computation; senders provide values.

        Reference semantics (runtime.py:403-509): every sender Shamir-splits
        its secret and scatters the rows; returns one secure object (or list)
        per sender.
        """
        x_is_list = isinstance(x, list)
        xl = list(x) if x_is_list else [x]
        senders_is_int = isinstance(senders, int)
        if senders is None:
            senders = range(len(self.parties))
        senders = [senders] if senders_is_int else list(senders)
        y = self._distribute(xl, senders)
        if senders_is_int:
            y = y[0]
            if not x_is_list:
                y = y[0]
        elif not x_is_list:
            y = [a[0] for a in y]
        return y

    def _distribute(self, x, senders):
        if x == []:
            return [[] for _ in senders]
        stype = type(x[0])
        assert issubclass(stype, sectypes.SecureObject), \
            'input expects secure objects'
        if hasattr(stype, '_input'):
            return stype._input(x, senders)
        is_arr = issubclass(stype, sectypes.SecureArray)
        sctype = stype.sectype if is_arr else stype
        field = sctype.field
        m = len(self.parties)
        t = self.threshold
        n = len(x)

        results = []
        for peer in senders:
            pc = self._pc_next()
            if peer == self.pid:
                row_objs = []
                shares_per_party = []  # m entries, each list of n field arrays
                for xi in x:
                    flat = xi.share.flatten() if xi.share.shape \
                        else xi.share.reshape(1)
                    sh = thresha.np_random_split(field, flat, t, m, self._rng)
                    shares_per_party.append(sh)
                for other in range(m):
                    rows = [sh[other] for sh in shares_per_party]
                    if other == self.pid:
                        own_rows = rows
                    else:
                        data = b''.join(self._marshal(r) for r in rows)
                        self._send(other, pc, data)
                results.append(own_rows)
            else:
                results.append((peer, pc))

        y = []
        for k, res in enumerate(results):
            if isinstance(res, tuple):
                peer, pc = res
                data = self._recv(peer, pc)
                rows = self._split_rows(field, data, [self._flat_size(xi)
                                                      for xi in x])
            else:
                rows = res
            objs = []
            for xi, r in zip(x, rows):
                if is_arr and xi.shape:
                    share = r.reshape(xi.shape)
                else:
                    share = r.reshape(())
                objs.append(self._wrap(sctype, share, array=is_arr,
                                       integral=self._integral(xi)))
            y.append(objs)
        return y

    @staticmethod
    def _flat_size(xi):
        return xi.size if isinstance(xi, sectypes.SecureArray) else 1

    def _split_rows(self, field, data: bytes, sizes):
        rows = []
        off = 0
        bl = field.byte_length
        for sz in sizes:
            nb = sz * bl
            vals = field.from_bytes(data[off:off + nb])
            rows.append(field.array(np.array(vals, dtype=object)))
            off += nb
        return rows

    def output(self, x, receivers=None, threshold=None, raw=False):
        """Open secret-shared x to the receivers (default: all parties).

        Reference semantics (runtime.py:511-601): send own share to up to t
        successors among the receivers; receivers recombine t+1 points.
        """
        x_is_list = isinstance(x, list)
        xl = list(x) if x_is_list else [x]
        if not xl:
            return []
        # raw pipeline placeholders must resolve before type dispatch
        xl = [xi.force() if type(xi) is sectypes.LazyShare else xi
              for xi in xl]
        t = self.threshold if threshold is None else threshold
        m = len(self.parties)
        if receivers is None:
            receivers = range(m)
        receivers = [receivers] if isinstance(receivers, int) else list(receivers)

        stype = type(xl[0])
        if issubclass(stype, sectypes.SecureObject):
            if hasattr(stype, '_output'):
                ys = stype._output(xl, receivers, threshold)
                return ys if x_is_list else ys[0]
            is_arr = issubclass(stype, sectypes.SecureArray)
            sctype = stype.sectype if is_arr else stype
            field = sctype.field
            shares = [xi.share for xi in xl]
        else:
            field = xl[0].field if isinstance(xl[0], finfields.FiniteFieldArray) \
                else type(xl[0])
            is_arr = True
            sctype = None
            shares = xl

        pc = self._pc_next()
        rec = self._output_native(field, shares, receivers, t, m, pc)
        if rec is not None:
            ys = rec
            if self.pid in receivers:
                if sctype is not None and not raw:
                    conv = stype._output_conversion
                    if conv is not None:
                        ys = [conv(a) for a in ys]
                elif sctype is not None and not is_arr:
                    ys = [field(int(a.value[()])) for a in ys]
            return ys if x_is_list else ys[0]
        # send share to <= t successors among receivers
        payload = None
        for peer in receivers:
            if 0 < (peer - self.pid) % m <= t:
                if payload is None:
                    payload = b''.join(self._marshal(s.flatten() if s.shape else s.reshape(1))
                                       for s in shares)
                self._send(peer, pc, payload)
        if self.pid in receivers:
            pts = []
            for j in range(t):
                peer = (self.pid - t + j) % m
                data = self._recv(peer, pc)
                rows = self._split_rows(field, data,
                                        [s.size if s.shape else 1 for s in shares])
                pts.append((peer + 1, rows))
            own = [s.flatten() if s.shape else s.reshape(1) for s in shares]
            pts.append((self.pid + 1, own))
            ys = []
            for i in range(len(shares)):
                points = [(xc, rows[i]) for xc, rows in pts]
                rec = thresha.np_recombine(field, points)
                orig = shares[i]
                rec = rec.reshape(orig.shape) if orig.shape else rec.reshape(())
                ys.append(rec)
            if sctype is not None and not raw:
                conv = stype._output_conversion
                if conv is not None:
                    ys = [conv(a) for a in ys]
            elif sctype is not None and not is_arr:
                # raw open of scalar secure numbers: field elements
                # (reference runtime.py:593-596 yields field values)
                ys = [field(int(a.value[()])) for a in ys]
        else:
            ys = [None] * len(shares)
        return ys if x_is_list else ys[0]

    # minimum total batch size before the native host-field C kernels
    # take over a protocol round on the per-party plane (ctypes dispatch
    # is ~2 us/kernel — far below the object path's per-round cost even
    # for scalars, so the native round serves every size)
    _NATIVE_MIN = 1

    def _hf(self, field):
        """Native host-field kernel context for a prime field (or None)."""
        if field.ext_deg != 1 or field.characteristic == 2 or \
                field.modulus.bit_length() > 512:
            return None
        from mpyc_tpu.ops import hostfield
        from mpyc_tpu.ops.fieldops import prime_field_ctx
        return hostfield.host_ctx(prime_field_ctx(field.modulus))

    def _hf_nonce(self):
        """(session key, fresh 12-byte nonce) for party-private ChaCha
        randomness (never reused: a per-runtime counter)."""
        key = getattr(self, '_hf_key', None)
        if key is None:
            key = self._hf_key = secrets.token_bytes(32)
            self._hf_ctr = 0
        self._hf_ctr += 1
        return key, self._hf_ctr.to_bytes(12, 'little')

    # below this size, native-kernel results re-enter the jax-free
    # plane's object representation (chained small host ops then skip the
    # limb decode); larger arrays stay in the limb rep the kernels use
    _NATIVE_OBJ_N = 4096

    def _hf_rep(self, hf, total):
        from mpyc_tpu.utils import lazyjax as _lazyjax
        if not _lazyjax.loaded() and total < self._NATIVE_OBJ_N:
            return hf.obj_rep
        return hf.limb_rep

    def _hf_host_u64(self, hf, field_arrays):
        """Concatenated uint64 Montgomery view of host field arrays, or
        None when any lives on a non-CPU device / has an unsupported rep."""
        us = []
        for s in field_arrays:
            if not isinstance(s, finfields.FiniteFieldArray):
                return None  # scalar field elements: object path
            d = s.data
            if not isinstance(d, np.ndarray):
                from mpyc_tpu.ops import fieldops as _fops
                if not _fops._cpu_backend() or not hasattr(d, 'devices'):
                    return None
                d = np.asarray(d)
            try:
                us.append(hf.mont_u64(d))
            except (TypeError, OverflowError):
                return None
        return us[0] if len(us) == 1 else np.concatenate(us)

    def _output_native(self, field, shares, receivers, t, m, pc):
        """Native-kernel open: wire marshal + Lagrange recombination at C
        speed (wire format identical to the object path).  Returns the
        list of recombined field arrays (or Nones for non-receivers), or
        None when not applicable."""
        hf = self._hf(field)
        if hf is None:
            return None
        sec = self._hf_host_u64(hf, shares)
        if sec is None:
            return None
        sizes = [s.size if s.shape else 1 for s in shares]
        total = sum(sizes)
        bl = field.byte_length
        payload = None
        for peer in receivers:
            if 0 < (peer - self.pid) % m <= t:
                if payload is None:
                    payload = hf.to_wire(sec, bl)
                self._send(peer, pc, payload)
        if self.pid not in receivers:
            return [None] * len(shares)
        preds = [(self.pid - t + j) % m for j in range(t)]
        xs = tuple(q + 1 for q in preds) + (self.pid + 1,)
        vec = thresha._recombination_vector(field, xs, 0)
        wires = [self._recv(q, pc, nbytes=total * bl) for q in preds]
        acc = hf.recombine_rows(sec, int(vec[t]), wires,
                                [int(v) for v in vec[:t]], total, bl)
        rep = self._hf_rep(hf, total)
        ys = []
        off = 0
        st = hf.stride
        for s, sz in zip(shares, sizes):
            u = acc[off * st:(off + sz) * st]
            off += sz
            shape = s.shape
            ys.append(field.array.from_data(rep(u, shape)))
        return ys

    def _reshare_native(self, xl, t, m, field, pc, uci):
        """One GRR98 round through the native C batch kernels
        (ops/hostfield.py): split + wire marshal + Lagrange recombine run
        at C speed over uint64 Montgomery residues instead of Python
        bigints.  Wire format is identical to the object path (plain
        little-endian field values), so the two paths interoperate.
        Returns the list of recombined field arrays, or None when not
        applicable (non-prime field, big modulus, device data, tiny batch).
        """
        hf = self._hf(field)
        if hf is None:
            return None
        datas = []
        for xi in xl:
            if not isinstance(xi, finfields.FiniteFieldArray):
                return None  # scalar field elements: object path
            d = xi.data
            if not isinstance(d, np.ndarray):
                from mpyc_tpu.ops import fieldops as _fops
                if not _fops._cpu_backend() or not hasattr(d, 'devices'):
                    return None
                d = np.asarray(d)  # jax CPU-backend array: view, no copy
            datas.append(d)
        shapes = [xi.shape for xi in xl]
        sizes = [xi.size if xi.shape else 1 for xi in xl]
        total = sum(sizes)
        if total < self._NATIVE_MIN:
            return None
        bl = field.byte_length
        own_row = None
        if (self.pid - uci) % m <= 2 * t:
            try:
                if len(datas) == 1:
                    sec = hf.mont_u64(datas[0])
                else:
                    sec = np.concatenate([hf.mont_u64(d) for d in datas])
            except (TypeError, OverflowError):
                return None
            key, nonce = self._hf_nonce()
            own_row, wire = hf.reshare_send(sec, t, m, self.pid,
                                            key, nonce, bl)
            for other in range(m):
                if other != self.pid:
                    self._send(other, pc, wire[other].tobytes())

        def complete():
            xs = tuple((uci + j) % m + 1 for j in range(2 * t + 1))
            vec = thresha._recombination_vector(field, xs, 0)
            own_c = 0
            wires = []
            wire_cs = []
            for j in range(2 * t + 1):
                peer = (uci + j) % m
                if peer == self.pid:
                    own_c = int(vec[j])
                else:
                    wires.append(self._recv(peer, pc, nbytes=total * bl))
                    wire_cs.append(int(vec[j]))
            acc = hf.recombine_rows(own_row, own_c, wires, wire_cs,
                                    total, bl)
            rep = self._hf_rep(hf, total)
            ys = []
            off = 0
            st = hf.stride
            for shape, sz in zip(shapes, sizes):
                u = acc[off * st:(off + sz) * st]
                off += sz
                ys.append(field.array.from_data(rep(u, shape)))
            return ys

        if self._pipeline:
            done = []

            def thunk():
                if not done:
                    done.append(complete())
                return done[0]

            return [sectypes.LazyShare(thunk, i, shape)
                    for i, shape in enumerate(shapes)]
        return complete()

    def _reshare(self, x):
        """Degree reduction a la GRR98 (reference: runtime.py:603-689).

        x: field array (or list of). 2t+1 parties re-split their shares; all
        parties recombine. Rotating sender set by pc mod m balances load.
        """
        x_is_list = isinstance(x, list)
        xl = x if x_is_list else [x]
        t = self.threshold
        if t == 0:
            return x
        field = xl[0].field
        m = len(self.parties)
        pc = self._pc_next()
        uci = pc % m

        if not getattr(self, 'is_simulator', False):
            ys = self._reshare_native(xl, t, m, field, pc, uci)
            if ys is not None:
                return ys if x_is_list else ys[0]

        own_rows = None
        if (self.pid - uci) % m <= 2 * t:
            splits = []
            for xi in xl:
                flat = xi.flatten() if xi.shape else xi.reshape(1)
                splits.append(thresha.np_random_split(field, flat, t, m,
                                                      self._rng))
            for other in range(m):
                rows = [sp[other] for sp in splits]
                if other == self.pid:
                    own_rows = rows
                else:
                    self._send(other, pc,
                               b''.join(self._marshal(r) for r in rows))

        sizes = [xi.size if xi.shape else 1 for xi in xl]
        shapes = [xi.shape for xi in xl]

        def complete():
            pts = []
            for j in range(2 * t + 1):
                peer = (uci + j) % m
                if peer == self.pid:
                    if own_rows is not None:
                        pts.append((peer + 1, own_rows))
                else:
                    data = self._recv(peer, pc)
                    pts.append((peer + 1,
                                self._split_rows(field, data, sizes)))
            ys = []
            for i, shape in enumerate(shapes):
                points = [(xc, rows[i]) for xc, rows in pts]
                rec = thresha.np_recombine(field, points)
                ys.append(rec.reshape(shape) if shape else rec.reshape(()))
            return ys

        if self._pipeline:
            # pipeline mode: sends are out; defer receive + recombine so
            # subsequent independent rounds can issue their sends first
            # (latency hiding a la reference asyncoro dataflow)
            done = []

            def thunk():
                if not done:
                    done.append(complete())
                return done[0]

            ys = [sectypes.LazyShare(thunk, i, shape)
                  for i, shape in enumerate(shapes)]
            return ys if x_is_list else ys[0]

        ys = complete()
        return ys if x_is_list else ys[0]

    def transfer(self, obj, senders=None, receivers=None, sender_receivers=None):
        """Transfer Python objects between parties (pickled; reference
        runtime.py:344-401)."""
        import pickle
        m = len(self.parties)
        senders_is_int = isinstance(senders, int)
        if sender_receivers is None:
            snd = [senders] if senders_is_int else \
                list(range(m) if senders is None else senders)
            rcv = [receivers] if isinstance(receivers, int) else \
                list(range(m) if receivers is None else receivers)
            pairs = {(s, r) for s in snd for r in rcv}
        else:
            if isinstance(sender_receivers, dict):
                # {sender: iterable of receivers} form (reference
                # runtime.py:344-401)
                pairs = {(s, r) for s, rs in sender_receivers.items()
                         for r in rs}
            else:
                pairs = {(s, r) for s, r in sender_receivers}
        pc = self._pc_next()
        if any(s == self.pid for s, r in pairs):
            data = pickle.dumps(obj)
            for s, r in sorted(pairs):
                if s == self.pid and r != self.pid:
                    self._send(r, pc, data)
        out = {}
        for s, r in sorted(pairs):
            if r == self.pid:
                if s == self.pid:
                    out[s] = pickle.loads(pickle.dumps(obj))
                else:
                    out[s] = pickle.loads(self._recv(s, pc))
        if sender_receivers is None:
            y = [out.get(s) for s in snd] if self.pid in rcv else [None] * len(snd)
            return y[0] if senders_is_int else y
        return out

    def convert(self, x, t_type):
        """Secure conversion to t_type (reference: runtime.py:691-787)."""
        x_is_list = isinstance(x, list)
        xl = list(x) if x_is_list else [x]
        if not xl:
            return []
        xl = [self._wrap(type(xi).sectype,
                         self._logical_reshape(self._share(xi), ()),
                         array=False, integral=self._integral(xi))
              if isinstance(xi, sectypes.SecureArray) and xi.size == 1
              else xi for xi in xl]
        s_type = type(xl[0])
        if issubclass(s_type, sectypes.SecureFiniteField) and \
                issubclass(t_type, sectypes.SecureFiniteField):
            size = max(s_type.field.order, t_type.field.order)
            l = max(32, size.bit_length())
            secint = self.SecInt(l=l)
            y = self._convert(self._convert(xl, secint), t_type)
        else:
            y = self._convert(xl, t_type)
        return y if x_is_list else y[0]

    def _embed_field_values(self, c, t_field):
        """Public opened s_field array -> t_field array holding the same
        integer values (mod t_field.modulus).

        Device path for prime->prime: de-Montgomery the source limbs and
        radix-reduce the value limbs into the target Montgomery domain —
        no host round trip, so array conversion stays on device. Host
        fallback goes through object ints."""
        s_field = c.field
        if s_field.ext_deg == 1 and s_field.characteristic > 2 and \
                t_field.ext_deg == 1 and t_field.characteristic > 2 and \
                not isinstance(c.data, np.ndarray):
            s_ctx = type(c).ctx
            t_ctx = t_field.array.ctx
            std = s_ctx.to_std(c.data)            # (..., Ls) value limbs
            Ls, Lt = s_ctx.L, t_ctx.L
            nc = -(-Ls // Lt)
            if nc * Lt != Ls:
                pad = jnp.zeros(std.shape[:-1] + (nc * Lt - Ls,), std.dtype)
                std = jnp.concatenate([std, pad], axis=-1)
            wide = std.reshape(std.shape[:-1] + (nc, Lt))
            return t_field.array.from_data(t_ctx.reduce_chunks(nc)(wide))
        vals = np.asarray(c.value, dtype=object)
        return t_field.array(vals)

    def _convert(self, x, t_type):
        """Masked-open field conversion (reference runtime.py:720-787),
        generalized to secure ARRAYS as well (the reference leaves
        np_convert as a TODO, runtime.py:4428): all items are flattened
        into one batch, one mask/open round serves everything, and the
        opened values embed into the target field on device."""
        s_type = type(x[0])
        is_arr = issubclass(s_type, sectypes.SecureArray)
        s_ctype = s_type.sectype if is_arr else s_type
        t_ctype = getattr(t_type, 'sectype', t_type)
        s_field = s_ctype.field
        t_field = t_ctype.field
        s_is_ff = issubclass(s_ctype, sectypes.SecureFiniteField)
        sizes = [xi.size if is_arr else 1 for xi in x]
        shapes = [xi.shape if is_arr else None for xi in x]
        n = sum(sizes)
        m = len(self.parties)
        t = self.threshold
        if s_is_ff:
            bound = s_field.order
            l = None
        else:
            k = self.options.sec_param
            l = min(s_ctype.bit_length, t_ctype.bit_length)
            d_senders = t + 1 if self.options.no_prss else math.comb(m, t)
            # power-of-2 bound (reference uses exact bound; a power of two
            # embeds the identical integers into both fields on device)
            bound = 1 << max(0, (k + l) - d_senders.bit_length() + 1)

        if self.options.no_prss:
            # t+1 senders input the *same* integers into both fields
            # (reference runtime.py:740-755)
            senders = self._no_prss_senders()
            ints = [secrets.randbelow(bound) for _ in range(n)]
            s_r = self._np_input_sum(s_field, n, lambda: ints, senders)
            t_r = self._np_input_sum(t_field, n, lambda: ints, senders)
        else:
            prfs_s = self.prfs(bound)
            uci = self._prss_uci()
            # same uci (hence the same PRF integers) in both fields
            # (reference: runtime.py:758-761)
            if s_is_ff:
                # arbitrary bound q: host integer stream embeds identically
                prss = thresha.np_pseudorandom_share_host
            else:
                prss = thresha.np_pseudorandom_share
            s_r = prss(s_field, m, self.pid, prfs_s, uci, n)
            t_r = prss(t_field, m, self.pid, prfs_s, uci, n)

        d = t_ctype.frac_length - s_ctype.frac_length
        shares = [self._share(xi) if is_arr else xi.share for xi in x]
        shares = [sh.flatten() if sh.shape else sh.reshape(1)
                  for sh in shares]
        stacked = _concat_field(s_field, shares)
        if d < 0:
            stacked = self.np_trunc_field(stacked, -d, s_ctype.bit_length,
                                          s_ctype)
        if s_field.is_signed:
            offset = s_field.order // 2 if s_is_ff else 1 << (l - 1)
        else:
            offset = 0
        masked = stacked + offset + s_r
        c = self.output(masked)  # public field array in s_field
        if s_is_ff:
            # full public-modulus reduction [GMS10] in the target field,
            # batched over the whole (n,) flat batch (scalars and arrays
            # alike; the reference has the scalar case at runtime.py:758-787)
            c_ints = np.array([int(v) for v in
                               np.atleast_1d(c.value).reshape(-1)],
                              dtype=object)
            v = t_field.array(c_ints) - t_r
            sec = self._wrap(t_ctype, v, array=True, integral=True)
            sec = self._mod(sec, int(s_field.modulus))
            v = self._share(sec) - offset
        else:
            v = self._embed_field_values(c, t_field) - t_r - offset
        if d > 0:
            # scale into the target fxp domain; the reference gets this
            # shift from _mod's final <<f (runtime.py:1880)
            v = v * (1 << d)
        integral = not s_ctype.frac_length
        out = []
        off = 0
        for size, shape in zip(sizes, shapes):
            piece = v[off:off + size]
            off += size
            if shape is not None:
                res = self._wrap(t_ctype, piece.reshape(shape), array=True,
                                 integral=integral)
            else:
                res = t_ctype(piece.reshape(()))
                if issubclass(t_ctype, sectypes.SecureFixedPoint):
                    res.integral = integral
            out.append(res)
        return out

    # ======================================================================
    # randomness
    # ======================================================================

    def _no_prss_senders(self):
        """Rotating t+1 sender set for the interactive (no-PRSS) randomness
        protocols (reference runtime.py:4036-4038: pc-based load balancing)."""
        m = len(self.parties)
        t = self.threshold
        uci = self._program_counter[0] % m
        return tuple((uci + i) % m for i in range(t + 1))

    def _np_input_rows(self, field, n, vals_fn, senders):
        """Each sender Shamir-splits n private values produced by vals_fn()
        and scatters the rows; returns the list of t+1 local share arrays.

        The interactive substitute for PRSS correlated randomness
        (reference runtime.py:4036-4055 input branches)."""
        m = len(self.parties)
        t = self.threshold
        rows = []
        for peer in senders:
            pc = self._pc_next()
            if peer == self.pid:
                vals = field.array(np.array([v % field.order
                                             for v in vals_fn()],
                                            dtype=object))
                sh = thresha.np_random_split(field, vals, t, m, self._rng)
                row = sh[self.pid]
                for other in range(m):
                    if other != self.pid:
                        self._send(other, pc, self._marshal(sh[other]))
            else:
                data = self._recv(peer, pc)
                row = self._split_rows(field, data, [n])[0]
            rows.append(row)
        return rows

    def _np_input_sum(self, field, n, vals_fn, senders=None):
        """Sum of t+1 private random inputs: degree-t sharing of the sum."""
        if senders is None:
            senders = self._no_prss_senders()
        rows = self._np_input_rows(field, n, vals_fn, senders)
        total = rows[0]
        for row in rows[1:]:
            total = total + row
        return total

    def _randoms(self, sftype, n, bound=None):
        """n secure random values (reference runtime.py:4023-4060)."""
        x = self._np_randoms_field(sftype, n, bound)
        if issubclass(sftype, sectypes.SecureObject):
            return [sftype(x.from_data(x.data[i])) for i in range(n)]
        return x

    def _np_randoms(self, sftype, n, bound=None):
        x = self._np_randoms_field(sftype, n, bound)
        if issubclass(sftype, sectypes.SecureObject):
            return sftype.array(x)
        return x

    def _np_randoms_field(self, sftype, n, bound=None):
        if issubclass(sftype, sectypes.SecureObject):
            field = sftype.field
        else:
            field = sftype
        m = len(self.parties)
        t = self.threshold
        if bound is None:
            bound = field.order
        else:
            d = t + 1 if self.options.no_prss else math.comb(m, t)
            bound = 1 << max(0, (bound // d).bit_length() - 1)
        if self.options.no_prss:
            return self._np_input_sum(
                field, n,
                lambda: [secrets.randbelow(bound) for _ in range(n)])
        return thresha.np_pseudorandom_share(field, m, self.pid,
                                             self.prfs(bound),
                                             self._prss_uci(), n)

    def _random(self, sftype, bound=None):
        x = self._randoms(sftype, 1, bound)
        return x[0] if isinstance(x, list) else x.reshape(())

    def random_bits(self, sftype, n, signed=False):
        """n secure uniformly random bits (list of secure numbers)."""
        arr = self.np_random_bits(sftype, n, signed)
        if issubclass(sftype, sectypes.SecureObject):
            out = []
            for i in range(n):
                o = sftype(arr.share.from_data(arr.share.data[i]))
                if issubclass(sftype, sectypes.SecureFixedPoint):
                    o.integral = True
                out.append(o)
            return out
        return [arr[i] for i in range(n)]

    def random_bit(self, stype, signed=False):
        return self.random_bits(stype, 1, signed)[0]

    def np_random_bits(self, sftype, n, signed=False):
        """Shape-(n,) secure array of uniform bits (reference:
        runtime.py:4186-4273, PRSS branch)."""
        if issubclass(sftype, sectypes.SecureObject):
            field = sftype.field
            f = sftype.frac_length
            is_sec = True
        else:
            field = sftype
            f = 0
            is_sec = False
        if not n:
            empty = field.array(np.array([], dtype=object))
            return sftype.array(empty) if is_sec else empty

        p = field.characteristic
        if p == 2:
            if self.options.no_prss:
                # sum (= XOR in char 2) of t+1 private random bits
                bits = self._np_input_sum(
                    field, n, lambda: [secrets.randbits(1) for _ in range(n)])
            else:
                bits = self._prss_bits_char2(field, n)
        else:
            if not getattr(self, 'is_simulator', False) and \
                    n <= self._BIT_POOL_REFILL:
                bits_pm1 = self._pooled_bits(field, n)
            else:
                bits_pm1 = self._random_bits_pm1(field, n)
            if signed:
                bits = bits_pm1
            else:
                ones = field.array(np.ones(n, dtype=object))
                bits = (bits_pm1 + ones) >> 1  # map {-1,1} -> {0,1}
        if f:
            bits = bits << f
        return sftype.array(bits) if is_sec else bits

    # small random-bit draws are served from a per-field pool refilled in
    # one batched round (each pooled bit is used once; same deterministic
    # pop/refill sequence at every party, so pc-tagged rounds stay aligned)
    _BIT_POOL_REFILL = 4096

    def _pooled_bits(self, field, n):
        """n secure +-1 bits from the per-field pool (refill batched)."""
        pool, off = self._bit_pool.get(field.modulus, (None, 0))
        if pool is None or pool.shape[-1] - off < n:
            parts = []
            have = 0
            if pool is not None and pool.shape[-1] > off:
                parts.append(pool[..., off:])
                have = pool.shape[-1] - off
            parts.append(self._random_bits_pm1(
                field, n - have + self._BIT_POOL_REFILL))
            pool = _concat_field(field, parts) if len(parts) > 1 else parts[0]
            off = 0
        self._bit_pool[field.modulus] = (pool, off + n)
        return pool[..., off:off + n]

    def _random_bits_pm1(self, field, n):
        """n secure uniform +-1 values over odd-char field (the raw
        protocol; reference runtime.py:4104-4273)."""
        m = len(self.parties)
        t = self.threshold
        if self.options.no_prss:
            # Multiply t+1 uniformly random +-1 private inputs in log2(t+1)
            # resharing rounds (reference runtime.py:4142-4158).
            rows = self._np_input_rows(
                field, n,
                lambda: [2 * secrets.randbits(1) - 1 for _ in range(n)],
                self._no_prss_senders())
            while len(rows) > 1:
                h = len(rows) // 2
                prods = [rows[2 * i] * rows[2 * i + 1] for i in range(h)]
                prods = self._reshare(prods)
                if len(rows) % 2:
                    prods.append(rows[-1])
                rows = prods
            return rows[0]
        prfs = self.prfs(field.order)
        parts_r, parts_r2 = [], []
        need = n
        while need:
            _r = thresha.np_pseudorandom_share(field, m, self.pid, prfs,
                                               self._prss_uci(), need)
            z = thresha.np_pseudorandom_share_0(field, m, self.pid, prfs,
                                                self._prss_uci(), need)
            r2_open = self.output(_r * _r + z, threshold=2 * t)
            good = np.array([int(v) != 0
                             for v in r2_open.value.reshape(-1)])
            idx = np.nonzero(good)[0]
            if len(idx) == need and not parts_r:
                parts_r, parts_r2 = [_r], [r2_open]
                need = 0
            else:
                # keep only the good draws, retry the rest
                parts_r.append(_r[idx])
                parts_r2.append(r2_open[idx])
                need -= len(idx)
        r = _concat_field(field, parts_r) if len(parts_r) > 1 else parts_r[0]
        r2o = _concat_field(field, parts_r2) if len(parts_r2) > 1 \
            else parts_r2[0]
        return r * r2o._sqrt_unchecked(INV=True)  # in {-1, +1}

    def _prss_bits_char2(self, field, n):
        """Char-2 PRSS bits: direct PRF bits path (exact, on device)."""
        m = len(self.parties)
        prfs = self.prfs(2)
        uci = self._prss_uci()
        acc = None
        for S, prf in prfs.items():
            fSi = thresha._f_S_i(field, m, self.pid, S)
            vals = field.array.from_data(prf.bits_uint32(uci, (n,)))
            term = vals * fSi
            acc = term if acc is None else acc + term
        return acc

    # ======================================================================
    # arithmetic core
    # ======================================================================

    def _coerce_op(self, stype, x):
        """Secure operand -> itself; public number -> encoded field value."""
        if isinstance(x, (sectypes.SecureObject, finfields.FiniteFieldArray)):
            return x
        return self._wrap(stype, self._encode_public(stype, x), array=False,
                          integral=self._integral(x))

    def add(self, a, b):
        """Secure addition of a and b."""
        stype = self._sectype(a, b)
        a = self._coerce_op(stype, a)
        b = self._coerce_op(stype, b)
        sa, sb = self._share2(a, b)
        res = sa + sb
        return self._wrap(stype, res, array=self._is_array_op(a, b),
                          integral=self._integral(a) and self._integral(b))

    def sub(self, a, b):
        """Secure subtraction of a and b."""
        stype = self._sectype(a, b)
        a = self._coerce_op(stype, a)
        b = self._coerce_op(stype, b)
        sa, sb = self._share2(a, b)
        res = sa - sb
        return self._wrap(stype, res, array=self._is_array_op(a, b),
                          integral=self._integral(a) and self._integral(b))

    def neg(self, a):
        """Secure negation of a."""
        stype = self._sectype(a)
        return self._wrap(stype, -self._share(a),
                          array=self._is_array_op(a),
                          integral=self._integral(a))

    def pos(self, a):
        stype = self._sectype(a)
        return self._wrap(stype, self._share(a), array=self._is_array_op(a),
                          integral=self._integral(a))

    def mul(self, a, b):
        """Secure multiplication of a and b (b may be public)."""
        stype = self._sectype(a)
        f = stype.frac_length
        b_is_sec = isinstance(b, sectypes.SecureObject)
        a_int = self._integral(a)
        if not b_is_sec:
            # public multiplier: local product, no reshare
            b_int = self._integral(b)
            if f and isinstance(b, (finfields.FiniteFieldElement,
                                    finfields.FiniteFieldArray)):
                # public field values are fxp-encoded raw (reference
                # runtime.py:1071-1092: b_integral False, z == 0)
                b_int = False
            sb = self._encode_public(stype, b)
            c = self._share(a) * sb  # public operand broadcasts
            if f and (a_int or b_int):
                c = c >> f  # exact: product divisible by 2^f
            elif f:
                c = self._trunc_field(c, f, stype.bit_length + f, stype)
            arr = self._is_array_op(a) or bool(c.shape[self._pax:])
            return self._wrap(stype, c, array=arr,
                              integral=a_int and b_int)
        b_int = self._integral(b)
        sa, sb = self._share2(a, b)
        c = sa * sb
        if f and (a_int or b_int):
            c = c >> f  # exact division by 2^f
        c = self._reshare(c)
        if f and not (a_int or b_int):
            c = self._trunc_field(c, f, stype.bit_length + f, stype)
        return self._wrap(stype, c, array=self._is_array_op(a, b),
                          integral=a_int and b_int)

    def _encode_public(self, stype, b):
        """Encode a public operand into the field (fxp scaling applied)."""
        f = stype.frac_length
        field = stype.field
        if isinstance(b, sectypes.SecureObject):
            raise TypeError('not public')
        if isinstance(b, (int, np.integer)):
            v = int(b) << f if f else int(b)
            return field.array(np.array(v, dtype=object))
        if isinstance(b, float):
            if not f:
                raise TypeError('float constant needs fixed-point type')
            return field.array(np.array(round(b * (1 << f)), dtype=object))
        if isinstance(b, finfields.FiniteFieldElement):
            return field.array(np.array(b.value, dtype=object))
        if isinstance(b, finfields.FiniteFieldArray):
            return b
        if isinstance(b, (list, tuple, np.ndarray)):
            arr = np.asarray(b, dtype=object)

            def enc(v):
                if isinstance(v, float):
                    return round(v * (1 << f))
                if isinstance(v, finfields.FiniteFieldElement):
                    return int(v)  # raw field value, no fxp scaling
                return int(v) << f if f else int(v)
            return field.array(np.vectorize(enc, otypes=[object])(arr))
        raise TypeError(f'cannot encode {type(b)}')

    def schur_prod(self, x, y):
        """Secure entrywise product of lists/arrays x and y."""
        if isinstance(x, list):
            return [self.mul(a, b) for a, b in zip(x, y)]
        return self.mul(x, y)

    def scalar_mul(self, a, x):
        """Secure scalar a times each element of list x."""
        return [self.mul(xi, a) for xi in x]

    def sum(self, x, start=0):
        """Secure sum of elements of list x (reference runtime.py:2025-2043)."""
        if isinstance(x, sectypes.SecureArray):
            return self.np_sum(x)
        x = list(x)
        if not x:
            return start
        if isinstance(start, sectypes.SecureObject) or start != 0:
            x[0] = self.add(x[0], start)  # NB: updates x[0].integral too
        stype = self._sectype(*x)
        acc = self._share(x[0])
        for xi in x[1:]:
            acc = acc + self._share(xi)
        return self._wrap(stype, acc, array=False,
                          integral=all(self._integral(xi) for xi in x))

    def in_prod(self, x, y):
        """Secure dot product of lists x and y (one round)."""
        if not x:
            return 0
        stype = self._sectype(*x, *y)
        f = stype.frac_length
        a_int = all(self._integral(xi) for xi in x)
        b_int = all(self._integral(yi) for yi in y)
        acc = None
        for xi, yi in zip(x, y):
            t = self._share(xi) * self._share(yi)
            acc = t if acc is None else acc + t
        if f and (a_int or b_int):
            acc = acc >> f
        acc = self._reshare(acc)
        if f and not (a_int or b_int):
            acc = self._trunc_field(acc, f, stype.bit_length + f, stype)
        return self._wrap(stype, acc, array=False, integral=a_int and b_int)

    def prod(self, x, start=1):
        """Secure product of elements of list x (log depth)."""
        if not x:
            return start
        if start != 1:
            x = x + [start if isinstance(start, sectypes.SecureObject)
                     else type(x[0])(start)]
        x = list(x)
        while len(x) > 1:
            nxt = []
            for i in range(0, len(x) - 1, 2):
                nxt.append(self.mul(x[i], x[i + 1]))
            if len(x) % 2:
                nxt.append(x[-1])
            x = nxt
        return x[0]

    def pow(self, a, b: int):
        """Secure exponentiation a**b for public integer b."""
        if isinstance(a, sectypes.SecureFloat):
            # square-and-multiply via the type's own * (and reciprocal)
            if b == 0:
                return type(a)(1)
            if b < 0:
                a, b = a.reciprocal(), -b
            res, d = None, a
            for i in range(b.bit_length()):
                if (b >> i) & 1:
                    res = d if res is None else res * d
                if i < b.bit_length() - 1:
                    d = d * d
            return res
        stype = self._sectype(a)
        if b == 254:  # AES S-box addition chain, 11 muls in 9 rounds
            # (reference runtime.py:1296-1309)
            d = a
            c = self.mul(d, d)
            c = self.mul(c, c)
            c = self.mul(c, c)
            c = self.mul(c, d)
            c = self.mul(c, c)
            c, d = self.mul(c, c), self.mul(c, d)
            c, d = self.mul(c, c), self.mul(c, d)
            c = self.mul(c, d)
            c = self.mul(c, c)
            return c
        if b == 0:
            if self._is_array_op(a):
                return self._wrap(stype, self._share_like(self._encode_public(
                    stype, np.ones(a.shape, dtype=object))), array=True,
                    integral=True)
            return self._wrap(stype, self._encode_public(stype, 1),
                              array=False, integral=True)
        if b < 0:
            if stype.frac_length:
                a = self._rec(a)
            else:
                a = self.reciprocal(a)
            b = -b
        res = None
        d = a
        for i in range(b.bit_length()):
            if (b >> i) & 1:
                res = d if res is None else self.mul(res, d)
            if i < b.bit_length() - 1:
                d = self.mul(d, d)
        return res

    def abs(self, a):
        """Secure absolute value of a."""
        return self.mul(self.sgn(a), a)

    # division --------------------------------------------------------------

    def div(self, a, b):
        """Secure division of a by b."""
        stype = self._sectype(a) if isinstance(a, sectypes.SecureObject) \
            else self._sectype(b)
        if isinstance(b, sectypes.SecureObject):
            if stype.frac_length:
                c = self._rec(b)
            else:
                c = self.reciprocal(b)
            return self.mul(c, a)
        # public divisor
        f = stype.frac_length
        if f:
            if isinstance(b, (int, float)):
                c = 1 / b
                if c.is_integer():
                    c = round(c)
            elif isinstance(b, (finfields.FiniteFieldElement,
                                finfields.FiniteFieldArray)):
                # raw field divisor: 1/b scaled into the fxp domain
                # (reference runtime.py:1184-1188)
                c = b.reciprocal() << f
            else:
                c = [1 / x for x in b] if isinstance(b, (list, tuple)) else 1 / b
        elif isinstance(b, (sectypes.SecureObject, finfields.FiniteFieldElement)):
            c = b.reciprocal()
        else:
            field = stype.field
            if isinstance(b, int):
                c = field(b).reciprocal().value
                c = field.array(np.array(c, dtype=object))
            elif isinstance(b, (list, tuple, np.ndarray)):
                arr = np.asarray(b, dtype=object)
                c = field.array(np.vectorize(
                    lambda v: field(int(v)).reciprocal().value,
                    otypes=[object])(arr))
            else:
                raise TypeError(f'cannot divide by {type(b)}')
            res = self._share(a) * c
            return self._wrap(stype, res, array=self._is_array_op(a),
                              integral=False)
        return self.mul(a, c)

    def reciprocal(self, a):
        """Secure reciprocal (multiplicative field inverse) of a, for a != 0."""
        stype = self._sectype(a)
        field = stype.field
        while True:
            r = self._np_randoms(field, max(a.share.size, 1))
            r = r.reshape(a.share.shape) if a.share.shape else r.reshape(())
            c = r * a.share
            c = self._reshare(c)
            c_open = self.output(c)
            vals = c_open.value.reshape(-1) if c_open.shape else \
                np.array([c_open.value[()]])
            if all(int(v) != 0 for v in vals):
                break
        inv = c_open.reciprocal()
        res = r * inv
        if stype.frac_length:
            res = res * (1 << (2 * stype.frac_length))  # fxp scaling
        return self._wrap(stype, res, array=self._is_array_op(a),
                          integral=False)

    # truncation -------------------------------------------------------------

    def trunc(self, x, f=None, l=None):
        """Secure truncation of f least significant bits of x."""
        x_is_list = isinstance(x, list)
        xl = x if x_is_list else [x]
        stype = self._sectype(xl[0])
        if f is None:
            f = stype.frac_length
        if l is None:
            l = stype.bit_length
        if issubclass(stype, sectypes.SecureFixedPoint):
            l += f
        ys = []
        shares = [xi.share for xi in xl]
        stacked = _concat_field(stype.field,
                                [s.reshape(1) if not s.shape else s.flatten()
                                 for s in shares])
        out = self._trunc_field(stacked, f, l, stype)
        off = 0
        for xi in xl:
            sz = xi.share.size if xi.share.shape else 1
            part = out[off:off + sz]
            part = part.reshape(xi.share.shape) if xi.share.shape \
                else part.reshape(())
            ys.append(self._wrap(stype, part,
                                 array=isinstance(xi, sectypes.SecureArray),
                                 integral=False))
            off += sz
        return ys if x_is_list else ys[0]

    def np_trunc(self, a, f=None, l=None):
        """Elementwise truncation of secure array a."""
        stype = self._sectype(a)
        if f is None:
            f = stype.frac_length
        if l is None:
            l = stype.bit_length
        if issubclass(stype, sectypes.SecureFixedPoint):
            l += f
        out = self._trunc_field(a.share, f, l, stype)
        return self._wrap(stype, out, array=True, integral=False)

    def np_trunc_field(self, arr, f, l, stype):
        return self._trunc_field(arr, f, l, stype)

    def _trunc_field(self, arr, f, l, stype):
        """Probabilistic truncation on a raw field array (runtime.py:838-873)."""
        field = stype.field
        shape = arr.shape
        n = arr.size if shape else 1
        flat = arr.flatten() if shape else arr.reshape(1)
        k = self.options.sec_param
        r_bits = self.np_random_bits(field, f * n)
        # r_modf[i] = sum_j r_bits[i*f + j] * 2^j
        r_mat = r_bits.reshape(n, f)
        r_modf = None
        for j in range(f):
            term = r_mat[:, j] << j
            r_modf = term if r_modf is None else r_modf + term
        r_divf = self._np_randoms(field, n, 1 << (k + l - f))
        ar = flat + r_modf
        c = self.output(ar + ((1 << (l - 1)) + (r_divf << f)))
        c_modf = c.mod_pow2(f)
        y = (ar - c_modf) >> f
        return y.reshape(shape) if shape else y.reshape(())

    # zero test (public) ------------------------------------------------------

    def eq_public(self, a, b):
        """Secure public equality test."""
        if isinstance(a, sectypes.SecureFloat) or \
                isinstance(b, sectypes.SecureFloat):
            return self.is_zero_public(a - b)
        return self.is_zero_public(self.sub(a, b))

    def is_zero_public(self, a):
        """Secure public zero test of a (reference: runtime.py:879-929)."""
        if isinstance(a, sectypes.SecureFloat):
            return type(a).is_zero_public(a)  # reference runtime.py:882-884
        stype = self._sectype(a) if isinstance(a, sectypes.SecureObject) else None
        field = stype.field if stype else type(a)
        share = self._share(a)
        m = len(self.parties)
        no_prss = self.options.no_prss
        rel_size = field.order.bit_length() // self.options.sec_param
        if rel_size == 0 and no_prss:
            threshold = self.threshold  # suffices due to the reshares below
        else:
            threshold = 2 * self.threshold
        prfs = None
        if rel_size >= 2:  # large field: random r nonzero whp
            r = self._np_randoms(field, 1).reshape(())
        else:
            prfs = None if no_prss else self.prfs(field.order)
            while True:
                rs = self._np_randoms(field, 2)
                r, s = rs[0], rs[1]
                rs_prod = r * s
                if rel_size == 0:
                    if no_prss:
                        rs_prod = self._reshare(rs_prod)
                    else:
                        z = thresha.np_pseudorandom_share_0(
                            field, m, self.pid, prfs, self._prss_uci(), 1)
                        rs_prod = rs_prod + z[0]
                opened = self.output(rs_prod, threshold=threshold)
                if int(opened.value[()] if not opened.shape else
                       opened.value[0]) != 0:
                    break
        b = share * r
        if rel_size == 0:
            if no_prss:
                b = self._reshare(b)
            elif prfs is not None:
                nz = max(b.size, 1)
                z = thresha.np_pseudorandom_share_0(
                    field, m, self.pid, prfs, self._prss_uci(), nz)
                b = b + (z.reshape(b.shape) if b.shape
                         else z.from_data(z.data[0]))
        c = self.output(b, threshold=threshold)
        if c.shape:
            return np.array([int(v) == 0 for v in c.value.reshape(-1)]) \
                .reshape(c.shape)
        return int(c.value[()]) == 0

    # ======================================================================
    # local shape ops on secure arrays
    # ======================================================================

    def _local(self, a, fn, integral=None):
        stype = self._sectype(a)
        share = fn(self._share(a))
        return self._wrap(stype, share, array=True,
                          integral=self._integral(a) if integral is None
                          else integral)

    def np_getitem(self, a, idx):
        stype = self._sectype(a)
        share = self._share(a)[idx]
        return self._wrap(stype, share, array=bool(share.shape),
                          integral=self._integral(a))

    def np_reshape(self, a, shape, order='C'):
        if isinstance(shape, (tuple, list)):
            if sum(1 for d in shape if d == -1) > 1:
                raise ValueError('can only specify one unknown dimension')
            known = 1
            for d in shape:
                if d != -1:
                    known *= d
            size = int(np.prod(a.shape, dtype=np.int64))
            if (-1 in shape and (known == 0 or size % known)) or \
                    (-1 not in shape and known != size):
                raise ValueError(
                    f'cannot reshape array of size {size} into shape {tuple(shape)}')
        return self._local(a, lambda s: s.reshape(shape, order=order))

    def np_flatten(self, a):
        return self._local(a, lambda s: s.flatten())

    def np_transpose(self, a, axes=None):
        return self._local(a, lambda s: s.transpose(*axes) if axes
                           else s.transpose())

    def np_swapaxes(self, a, i, j):
        return self._local(a, lambda s: s.swapaxes(i, j))

    def np_copy(self, a):
        return self._local(a, lambda s: s.copy())

    def np_roll(self, a, shift, axis=None):
        """Secure circular shift along a logical axis (local)."""
        stype = self._sectype(a)
        s = self._share(a)
        nd = len(s.shape) - self._pax
        if axis is None:
            flat = self._logical_flat(s)
            out = flat.roll(shift, self._pax)
            out = self._logical_reshape(out, a.shape)
        else:
            out = s.roll(shift, (axis % nd) + self._pax)
        return self._wrap(stype, out, array=True,
                          integral=self._integral(a))

    def np_flip(self, a, axis=None):
        """Secure reversal along logical axes (local).

        axis=None flips over all axes; an int or tuple selects axes
        (numpy semantics)."""
        stype = self._sectype(a)
        s = self._share(a)
        nd = len(s.shape) - self._pax
        if axis is None:
            axes = range(nd)
        elif isinstance(axis, int):
            axes = (axis % nd,)
        else:
            axes = tuple(ax % nd for ax in axis)
        data = s.data
        for ax in axes:
            data = finfields._xp(data).flip(data, axis=ax + self._pax)
        out = s.from_data(data)
        return self._wrap(stype, out, array=True,
                          integral=self._integral(a))

    def np_fromlist(self, x):
        """List of secure numbers -> secure 1-D array."""
        stype = self._sectype(*x)
        field = stype.field
        arrs = [self._share(xi).reshape(1) for xi in x]
        return self._wrap(stype, _concat_field(field, arrs), array=True,
                          integral=all(self._integral(xi) for xi in x))

    def np_tolist(self, a):
        """Secure array -> (nested) list of secure numbers."""
        stype = self._sectype(a)
        if len(a.shape) == 1:
            return [self._wrap(stype, self._share_scalar_at(a, i),
                               array=False, integral=self._integral(a))
                    for i in range(a.shape[0])]
        return [self.np_tolist(self.np_getitem(a, i))
                for i in range(a.shape[0])]

    def np_concatenate(self, arrays, axis=0):
        sec = [x for x in arrays if isinstance(x, sectypes.SecureObject)]
        stype = self._sectype(*sec)
        field = stype.field

        def pub(x):
            if isinstance(x, finfields.FiniteFieldArray):
                # already-encoded public field array: use its data as-is
                # (np.asarray(x, object) would pull a device array back
                # element by element)
                return self._share_like(x)
            return self._share_like(self._encode_public(
                stype, np.asarray(x, dtype=object)))

        shares = [self._share(x) if isinstance(x, sectypes.SecureObject)
                  else pub(x) for x in arrays]
        nd_elem = field.array._elem_ndim
        if axis is None:  # numpy semantics: flatten all inputs first
            shares = [self._logical_flat(s) for s in shares]
            axis = 0
        nd = len(shares[0].shape) - self._pax  # logical ndim
        ax = (axis % nd) + self._pax if axis >= 0 else axis - nd_elem
        out = field.array.from_data(
            finfields._xp(*[s.data for s in shares]).concatenate(
                [s.data for s in shares], axis=ax))
        return self._wrap(stype, out, array=True,
                          integral=all(self._integral(x) for x in arrays))

    def np_stack(self, arrays, axis=0):
        sec = [x for x in arrays if isinstance(x, sectypes.SecureObject)]
        stype = self._sectype(*sec)
        field = stype.field
        shares = [self._share(x) if isinstance(x, sectypes.SecureObject)
                  else self._share_like(self._encode_public(
                      stype, np.asarray(x, dtype=object)))
                  for x in arrays]
        nd = len(shares[0].shape) + 1  # logical ndim of the result (+party)
        nd_elem = field.array._elem_ndim
        ax = axis % (nd - self._pax) + self._pax if axis >= 0 else \
            axis - nd_elem
        out = field.array.from_data(
            finfields._xp(*[s.data for s in shares]).stack(
                [s.data for s in shares], axis=ax))
        return self._wrap(stype, out, array=True,
                          integral=all(self._integral(x) for x in arrays))

    def np_sum(self, a, axis=None, keepdims=False, initial=0):
        """Secure sum over axis (int, tuple, or None), with numpy's
        keepdims/initial (reference runtime.py:3476-3506)."""
        stype = self._sectype(a)
        nd = len(a.shape)
        share = self._share(a)
        if axis is None:
            axes = list(range(nd))
        elif isinstance(axis, int):
            axes = [axis % nd]
        else:
            axes = sorted(i % nd for i in axis)
        for ax in reversed(axes):
            share = share.sum(axis=ax + self._pax) if self._pax else \
                share.sum(axis=ax)
        if keepdims:
            share = self._logical_reshape(
                share, tuple(1 if i in axes else s
                             for i, s in enumerate(a.shape)))
        integral = self._integral(a)
        if isinstance(initial, sectypes.SecureObject) or initial != 0:
            if isinstance(initial, sectypes.SecureObject):
                share = share + self._share(initial)
            else:
                share = share + self._encode_public(stype, initial)
            integral = integral and self._integral(initial)
        return self._wrap(stype, share, array=bool(share.shape[self._pax:]),
                          integral=integral)

    def np_negative(self, a):
        return self.sub(0, a)

    def np_where(self, c, a, b):
        """Secure elementwise/broadcast selection c*a + (1-c)*b.

        a and b may both be public (plain numbers/arrays); the condition c
        is secure, so the result is (reference np.where via the array
        ufunc bridge, sectypes.py:21-92)."""
        try:
            d = self.sub(a, b)
        except TypeError:
            d = np.asarray(a) - np.asarray(b)  # both public
        if not isinstance(c, sectypes.SecureObject):
            # public condition with secure branches: select from the
            # secure difference side (bools become 0/1 multipliers)
            c = np.asarray(c, dtype=object) * 1
            return self.add(self.mul(d, c), b)
        return self.add(self.mul(c, d), b)

    def np_if_swap(self, c, a, b):
        """Secure swap of arrays a, b when condition c holds (c may be
        public, reference runtime.py:3369-3375)."""
        d = self.sub(b, a)
        if isinstance(c, sectypes.SecureObject):
            d = self.mul(c, d)
        else:
            d = self.mul(d, np.asarray(c, dtype=object) * 1)
        return [self.add(a, d), self.sub(b, d)]

    # ======================================================================
    # numpy-API parity (reference runtime.py:988-1294, 2637-3345)
    # ======================================================================
    # The generic ops are array-capable, so the elementwise np_* names are
    # aliases; the shape ops compose the plane-aware primitives
    # (np_getitem/np_concatenate/np_stack/np_reshape/...), which keeps them
    # correct on both the per-party and the co-located simulator plane.

    def np_add(self, a, b):
        return self.add(a, b)

    def np_subtract(self, a, b):
        return self.sub(a, b)

    def np_multiply(self, a, b):
        return self.mul(a, b)

    def np_divide(self, a, b):
        return self.div(a, b)

    def np_pow(self, a, b):
        """Secure elementwise exponentiation where a or b is public
        (reference runtime.py:1331-1388)."""
        if isinstance(b, (int, np.integer)) and b == 2:
            return self.mul(a, a)
        if isinstance(a, (int, float, np.integer, np.floating)) and \
                not isinstance(b, (int, float, np.integer, np.floating)):
            # public base, secure exponent
            if isinstance(a, (int, np.integer)):
                stype = self._sectype(b)
                if not stype.frac_length or self._integral(b):
                    if not isinstance(b, sectypes.SecureArray):
                        res = self.\
                            _np_pow_public_int_base_secret_integral_exponent(
                                int(a), self.np_fromlist([b]))
                        return self.np_getitem(res, 0)
                    return self.\
                        _np_pow_public_int_base_secret_integral_exponent(
                            int(a), b)
            if a != 2:
                b = self.mul(b, math.log2(a))  # a^b = 2^(b log2 a)
            return self.np_exp2(b)
        if isinstance(b, (float, np.floating)):
            if float(b).is_integer():
                b = int(b)
            else:  # NB: requires a > 0
                return self.np_exp2(self.mul(self.np_log2(a), float(b)))
        return self.pow(a, int(b))

    def _np_pow_public_int_base_secret_integral_exponent(self, a, b):
        """a**b for public int a > 0 and secret nonnegative integral
        exponents b (reference runtime.py:1390-1424, the protocol of
        secgroups repeat_public_base_secret_output).

        Each of t+1 rotating senders inputs (r_i, a^-r_i mod p); the
        masked exponent c = b + sum r_i is opened; a^b = a^c * prod
        a^-r_i, computed in the field.  Sender randomness is drawn below
        2^(l+k)/(t+1) so the sum statistically hides the l-bit exponent.
        """
        from mpyc_tpu import gmpy
        stype = type(b)
        sctype = getattr(stype, 'sectype', stype)
        field = sctype.field
        p = field.modulus
        t = self.threshold
        l, k = sctype.bit_length, self.options.sec_param
        f = sctype.frac_length
        bound = max(2, (1 << (l + k)) // (t + 1))
        size = int(np.prod(b.shape, dtype=np.int64)) if b.shape else 1
        senders = self._no_prss_senders()  # t+1 senders, pc-rotated
        a_modp = a % p
        ainv = int(gmpy.invert(a_modp, p))

        def contribution():
            r = [secrets.randbelow(bound) for _ in range(size)]
            a_r = [int(gmpy.powmod(ainv, ri, p)) for ri in r]
            arr = np.array([r, a_r], dtype=object)
            return stype(arr, integral=True) if f else stype(arr)

        if getattr(self, 'is_simulator', False):
            ins = [self.input(contribution(), senders=i) for i in senders]
        else:
            if self.pid in senders:
                x = contribution()
            else:
                z = np.zeros((2, size), dtype=object)  # type/shape only
                x = stype(z, integral=True) if f else stype(z)
            ins = self.input(x, senders=list(senders))
        r_sum = self.np_getitem(ins[0], (0,))
        for v in ins[1:]:
            r_sum = self.add(r_sum, self.np_getitem(v, (0,)))
        ars = [self.np_getitem(v, (1,)) for v in ins]
        while len(ars) > 1:  # log-depth product of the a^-r_i
            nxt = [self.mul(ars[i], ars[i + 1])
                   for i in range(0, len(ars) - 1, 2)]
            if len(ars) % 2:
                nxt.append(ars[-1])
            ars = nxt
        a_r = ars[0]
        b_flat = self.np_reshape(b, (size,)) if b.shape else \
            self.np_reshape(b, (1,))
        c = self.output(self.add(b_flat, r_sum), raw=True)
        c_ints = [int(v) >> f for v in np.asarray(c.value).reshape(-1)]
        a_c = np.array([int(gmpy.powmod(a_modp, ci, p)) for ci in c_ints],
                       dtype=object)
        res = self.mul(a_r, a_c)  # public multiplier: local, fxp-scaled
        return self.np_reshape(res, b.shape)

    def np_reciprocal(self, a):
        return self.reciprocal(a)

    def np_left_shift(self, a, b):
        """Secure elementwise a * 2**b for public non-negative b.

        Local field op; the result is integral when a is or when the
        shift covers the fraction (reference runtime.py:1157-1168)."""
        stype = self._sectype(a)
        f = stype.frac_length
        if isinstance(b, (int, np.integer)):
            res = self.mul(a, 1 << int(b))
            min_b = int(b)
        else:
            factors = np.array([1 << int(v)
                                for v in np.asarray(b).reshape(-1)],
                               dtype=object).reshape(np.asarray(b).shape)
            res = self.mul(a, factors)
            min_b = min(int(v) for v in np.asarray(b).reshape(-1))
        if f and hasattr(res, 'integral'):
            res.integral = self._integral(a) or min_b >= f
        return res

    def np_minimum(self, a, b):
        """Secure elementwise minimum."""
        c = self.np_less(a, b)  # a < b
        return self.add(b, self.mul(c, self.sub(a, b)))

    def np_maximum(self, a, b):
        """Secure elementwise maximum."""
        c = self.np_less(a, b)
        return self.add(a, self.mul(c, self.sub(b, a)))

    def np_any(self, a, axis=None):
        """Secure any() over 0/1 values along an axis."""
        return self.sub(1, self.np_all(self.sub(1, a), axis=axis))

    def np_cumulative_sum(self, a, axis=None):
        return self.np_cumsum(a, axis=axis)

    def add_bits(self, x, y):
        """Secure binary addition of equal-length bit lists x, y (LSB
        first); result bits = x + y mod 2**n (reference runtime.py:4275)."""
        n = len(x)
        if n == 0:
            return []
        stype = self._sectype(*x, *y)
        xa = self.np_fromlist([self._coerce_op(stype, v) for v in x])
        ya = self.np_fromlist([self._coerce_op(stype, v) for v in y])
        out = self.np_add_bits(xa, ya)
        return [self._bit_item(out, i) for i in range(n)]

    def lshift(self, a, b):
        """Secure left shift of a for public nonnegative integer b
        (reference runtime.py:1144)."""
        return self.mul(a, 1 << b)

    def peek(self, x, label=''):
        """Log the opened value of x (and this party's share) for
        debugging (reference runtime.py:210-229)."""
        txt = f'Peek at {abs(self._program_counter[0]) % (1 << 24):#08x}:'
        if label:
            txt += f' {label}'
        logging.info(f'{txt} Task output {self.run(self.output(x))}')
        logging.debug(f"{txt} Party {self.pid}'s share "
                      f'{self.run(self.gather(x))}')

    def np_add_bits(self, a, b):
        """Secure binary addition of bit arrays (last axis = bits, LSB
        first); result has the same width (sum mod 2**l)."""
        stype = self._sectype(a) if isinstance(a, sectypes.SecureObject) \
            else self._sectype(b)
        x = self._share(a) if isinstance(a, sectypes.SecureObject) \
            else self._encode_public(stype, a)
        y = self._share(b) if isinstance(b, sectypes.SecureObject) \
            else self._encode_public(stype, b)
        vec = len(x.shape) - self._pax == 1  # single bit vector: lift to 2-D
        if vec:
            x = self._logical_reshape(x, (1,) + x.shape[self._pax:])
            y = self._logical_reshape(y, (1,) + y.shape[self._pax:])
        out = self._add_bits_prefix(x, y)
        if vec:
            out = self._logical_reshape(out, out.shape[self._pax + 1:])
        return self._wrap(stype, out, array=True, integral=True)

    # -- shape manipulation -------------------------------------------------

    def np_expand_dims(self, a, axis):
        axes = (axis,) if isinstance(axis, int) else tuple(axis)
        out_nd = len(a.shape) + len(axes)
        norm = []
        for ax in axes:
            if not -out_nd <= ax < out_nd:
                raise ValueError(
                    f'axis {ax} is out of bounds for array of dimension {out_nd}')
            norm.append(ax % out_nd)
        if len(set(norm)) != len(norm):
            raise ValueError('repeated axis in expand_dims')
        it = iter(a.shape)
        shape = tuple(1 if i in norm else next(it) for i in range(out_nd))
        return self.np_reshape(a, shape)

    def np_squeeze(self, a, axis=None):
        shape = list(a.shape)
        if axis is None:
            new = [d for d in shape if d != 1]
        else:
            axes = (axis,) if isinstance(axis, int) else axis
            axes = {ax % len(shape) for ax in axes}
            if any(shape[ax] != 1 for ax in axes):
                raise ValueError('cannot squeeze non-unit axis')
            new = [d for i, d in enumerate(shape) if i not in axes]
        return self.np_reshape(a, tuple(new))

    def np_append(self, a, b, axis=None):
        if axis is None:
            a = self.np_flatten(a) if isinstance(a, sectypes.SecureArray) \
                else a
            b = self.np_flatten(b) if isinstance(b, sectypes.SecureArray) \
                else b
            axis = 0
        return self.np_concatenate([a, b], axis=axis)

    def _np_atleast(self, a, nd):
        if not isinstance(a, sectypes.SecureObject):
            a = np.asarray(a, dtype=object)
            return a.reshape((1,) * (nd - a.ndim) + a.shape) \
                if a.ndim < nd else a
        shape = a.shape
        while len(shape) < nd:
            shape = (1,) + shape
        return self.np_reshape(a, shape) if shape != a.shape else a

    def np_hstack(self, tup):
        tup = list(tup)
        axis = 0 if all(len(x.shape) == 1 for x in tup) else 1
        return self.np_concatenate(tup, axis=axis)

    def np_vstack(self, tup):
        return self.np_concatenate([self._np_atleast(x, 2) for x in tup],
                                   axis=0)

    def np_row_stack(self, tup):
        """Alias of np_vstack (reference runtime.py np_row_stack)."""
        return self.np_vstack(tup)

    def np_dstack(self, tup):
        out = []
        for x in tup:
            x = self._np_atleast(x, 2)
            if len(x.shape) == 2:
                x = self.np_reshape(x, x.shape + (1,))
            out.append(x)
        return self.np_concatenate(out, axis=2)

    def np_column_stack(self, tup):
        cols = [self.np_reshape(x, (x.shape[0], 1)) if len(x.shape) == 1
                else x for x in tup]
        return self.np_concatenate(cols, axis=1)

    def np_split(self, a, parts, axis=0):
        n = a.shape[axis]
        if isinstance(parts, int):
            if n % parts:
                raise ValueError('array split does not result in equal '
                                 'division')
            bounds = [(i * n // parts, (i + 1) * n // parts)
                      for i in range(parts)]
        else:
            edges = [0] + [int(i) for i in parts] + [n]
            bounds = list(zip(edges[:-1], edges[1:]))
        ax = axis % len(a.shape)
        pre = (slice(None),) * ax
        return [self.np_getitem(a, pre + (slice(i, j),)) for i, j in bounds]

    def np_hsplit(self, a, parts):
        return self.np_split(a, parts, axis=0 if len(a.shape) == 1 else 1)

    def np_vsplit(self, a, parts):
        return self.np_split(a, parts, axis=0)

    def np_dsplit(self, a, parts):
        return self.np_split(a, parts, axis=2)

    def np_diagonal(self, a, offset=0, axis1=0, axis2=1):
        nd = len(a.shape)
        if nd < 2:
            raise ValueError(
                'diag requires an array of at least two dimensions')
        if axis1 % nd == axis2 % nd:
            raise ValueError('axis1 and axis2 cannot be the same')
        n1, n2 = a.shape[axis1], a.shape[axis2]
        if offset >= 0:
            cnt = max(0, min(n1, n2 - offset))
            rows, cols = np.arange(cnt), np.arange(cnt) + offset
        else:
            cnt = max(0, min(n1 + offset, n2))
            rows, cols = np.arange(cnt) - offset, np.arange(cnt)
        nd = len(a.shape)
        a1, a2 = axis1 % nd, axis2 % nd
        idx = [slice(None)] * nd
        idx[a1], idx[a2] = rows, cols
        res = self.np_getitem(a, tuple(idx))
        if len(res.shape) > 1:
            # numpy.diagonal puts the diagonal axis last; fancy indexing
            # leaves it where the advanced indices were (if adjacent) or
            # first (if separated) — move it to the end
            lo, hi = sorted((a1, a2))
            pos = lo if hi == lo + 1 else 0
            perm = [i for i in range(len(res.shape)) if i != pos] + [pos]
            res = self.np_transpose(res, perm)
        return res

    def np_diag(self, a, k=0):
        if len(a.shape) > 2:
            raise ValueError('Input must be 1- or 2-d.')
        if len(a.shape) == 2:
            return self.np_diagonal(a, offset=k)
        return self.np_diagflat(a, k=k)

    def np_diagflat(self, a, k=0):
        a = self.np_flatten(a) if len(a.shape) != 1 else a
        n = a.shape[0] + abs(k)
        stype = self._sectype(a)
        # public zeros via the secure-array constructor: logical-shape
        # share, valid on both planes (sim broadcasts the party axis)
        zeros = stype.array(np.zeros((n, n), dtype=object))
        idx = np.arange(a.shape[0])
        rows, cols = (idx, idx + k) if k >= 0 else (idx - k, idx)
        res = self.np_update(zeros, (rows, cols), a)
        if hasattr(res, 'integral'):
            res.integral = self._integral(a)
        return res

    def np_trace(self, a, offset=0, axis1=0, axis2=1):
        return self.np_sum(self.np_diagonal(a, offset, axis1, axis2),
                           axis=-1 if len(a.shape) > 2 else None)

    def np_fliplr(self, a):
        return self.np_flip(a, axis=1)

    def np_flipud(self, a):
        return self.np_flip(a, axis=0)

    def np_rot90(self, a, k=1, axes=(0, 1)):
        axes = tuple(axes)
        if len(axes) != 2:
            raise ValueError('len(axes) must be 2.')
        nd = len(a.shape)
        if axes[0] % nd == axes[1] % nd:
            raise ValueError('Axes must be different.')
        if not (-nd <= axes[0] < nd and -nd <= axes[1] < nd):
            raise ValueError(
                f'Axes={axes} out of range for array of ndim={nd}.')
        k %= 4
        a0, a1 = axes
        if k == 0:
            return self.np_copy(a)
        if k == 2:
            return self.np_flip(self.np_flip(a, a0), a1)
        if k == 1:
            return self.np_swapaxes(self.np_flip(a, a1), a0, a1)
        return self.np_flip(self.np_swapaxes(a, a0, a1), a1)  # k == 3

    def np_block(self, arrays):
        """Assemble an array from nested lists of blocks (numpy.block
        semantics: innermost lists concatenate along the last axis, each
        nesting level up along the axis before)."""

        def depth(x):
            return 1 + depth(x[0]) if isinstance(x, list) else 0

        d = depth(arrays)

        def rec(x, level):
            if not isinstance(x, list):
                if isinstance(x, sectypes.SecureObject) and \
                        not isinstance(x, sectypes.SecureArray):
                    x = self.np_fromlist([x])  # scalar secure number
                return self._np_atleast(x, d)
            parts = [rec(xi, level + 1) for xi in x]
            return self.np_concatenate(parts, axis=level - d)

        return rec(arrays, 0)

    def np_cumsum(self, a, axis=None):
        """Secure cumulative sum along an axis (local Hillis-Steele
        prefix doubling; axis=None flattens first, numpy semantics)."""
        stype = self._sectype(a)
        s = self._share(a)
        nd_log = len(s.shape) - self._pax
        if axis is None:
            if nd_log != 1:
                s = self._logical_flat(s)
            ax = len(s.shape) - 1
        else:
            ax = (axis % nd_log) + self._pax
        moved = ax != len(s.shape) - 1
        if moved:
            s = s.from_data(
                finfields._xp(s.data).moveaxis(s.data, ax, len(s.shape) - 1))
        nd = len(s.shape)
        n = s.shape[-1]
        zeros = stype.field.array(np.zeros(1, dtype=object))
        d = 1
        while d < n:
            shifted = s.roll(d, axis=-1)
            shifted = shifted.at_set((..., slice(0, d)), zeros)
            s = s + shifted
            d *= 2
        if moved:
            s = s.from_data(
                finfields._xp(s.data).moveaxis(s.data, len(s.shape) - 1, ax))
        return self._wrap(stype, s, array=True, integral=self._integral(a))

    def np_convolve(self, a, b, mode='full'):
        """Secure 1-D convolution (polynomial product; one reshare round).

        The shorter operand is unrolled into a banded (Toeplitz) matrix of
        locally shifted copies so the product is a single secret-secret
        matmul on the MXU (reference np_convolve: runtime.py:2481+).
        Either operand may be public; numpy's full/same/valid modes apply.
        """
        for v in (a, b):
            if isinstance(v, sectypes.SecureArray) and len(v.shape) != 1:
                raise ValueError('object too deep for desired array')
        sec = [v for v in (a, b) if isinstance(v, sectypes.SecureObject)]
        stype = self._sectype(*sec)

        def lift(x):
            if isinstance(x, sectypes.SecureObject):
                return x
            enc = self._encode_public(stype, np.asarray(x, dtype=object))
            return self._wrap(stype, self._share_like(enc), array=True,
                              integral=all(self._integral(v) for v in x))

        a, b = lift(a), lift(b)
        na, nb = a.shape[0], b.shape[0]
        if not na or not nb:
            raise ValueError('v cannot be empty')
        if na < nb:
            a, b, na, nb = b, a, nb, na
        n = na + nb - 1
        pad = np.zeros(n - na, dtype=object)
        awide = self.np_concatenate((a, pad)) if n > na else a
        rows = self.np_stack([self.np_roll(awide, j) for j in range(nb)])
        brow = self.np_reshape(b, (1, nb))
        out = self.np_getitem(self.np_matmul(brow, rows), 0)
        if mode == 'same':
            lo = (nb - 1) // 2
            out = self.np_getitem(out, slice(lo, lo + na))
        elif mode == 'valid':
            out = self.np_getitem(out, slice(nb - 1, n - (nb - 1)))
        return out

    def np_outer(self, a, b):
        """Secure outer product of two flattened arrays (one reshare).

        Either operand may be public (numpy semantics: both are
        flattened first)."""

        def col(x, shape):
            if isinstance(x, sectypes.SecureArray):
                return self.np_reshape(self.np_flatten(x), shape)
            if isinstance(x, sectypes.SecureObject):
                return self.np_reshape(self.np_fromlist([x]), shape)
            return np.asarray(x, dtype=object).reshape(shape)

        ar = col(a, (-1, 1))
        br = col(b, (1, -1))
        if isinstance(ar, sectypes.SecureArray):
            return self.mul(ar, br)
        return self.mul(br, ar)  # broadcastwise product is commutative

    def np_vander(self, a, N=None, increasing=False):
        """Secure Vandermonde matrix: columns are elementwise powers of a
        (log-depth squaring ladder, reference runtime.py:4947-4977)."""
        n = len(a)
        if N is None:
            N = n

        def powers(k):
            # (n, k) array of columns a^1 .. a^k, log depth
            if k == 1:
                return self.np_reshape(a, (n, 1))

            b = powers((k + 1) // 2)
            c = self.np_getitem(b, (slice(None), slice(0, -1))) if k % 2 else b
            top = self.np_getitem(b, (slice(None), slice(-1, None)))
            return self.np_concatenate((b, self.mul(top, c)), axis=1)

        stype = self._sectype(a)
        ones = self._wrap(stype.sectype if hasattr(stype, 'sectype') else stype,
                          self._encode_public(stype, np.ones((n, 1), dtype=object)),
                          array=True, integral=True)
        if N == 0:
            return self.np_getitem(ones, (slice(None), slice(0, 0)))

        b = ones if N == 1 else self.np_concatenate((ones, powers(N - 1)), axis=1)
        if not increasing:
            b = self.np_flip(b, axis=1)
        return b

    def np_det(self, A):
        """Secure determinant of a nonsingular matrix via blinded LU:
        multiply by secret random triangular L, U, open L@U@A, divide the
        public determinant by det(U) (reference runtime.py:3952-3982)."""
        stype = self._sectype(A)
        sctype = stype.sectype if hasattr(stype, 'sectype') else stype
        field = sctype.field
        n = A.shape[-1]
        pax = self._pax  # leading party axes (1 on the simulator plane)
        while True:
            U = self._np_randoms(field, n * n)
            U = self._logical_reshape(U, (n, n))
            xp = np if isinstance(U.data, np.ndarray) else jnp
            dd = xp.diagonal(U.data, axis1=pax, axis2=pax + 1)
            dd = xp.moveaxis(dd, -1, pax)
            diag_raw = U.from_data(dd)
            sel = (slice(None),) * pax
            diag = [self._wrap(sctype, diag_raw[sel + (i,)],
                               array=False, integral=True)
                    for i in range(n)]
            detU = self.prod(diag)
            if not self.is_zero_public(detU):
                break

        # share-wise triangular split: slicing shares slices the secrets
        low = np.tril(np.ones((n, n), dtype=bool), -1)
        xp = np if isinstance(U.data, np.ndarray) else jnp
        lowm = xp.asarray(low).reshape(
            (1,) * pax + low.shape + (1,) * (U.data.ndim - 2 - pax))
        zero = xp.zeros_like(U.data)
        eye = self._encode_public(sctype, np.eye(n, dtype=object))
        L_raw = U.from_data(xp.where(lowm, U.data, zero)) + eye
        U_raw = U.from_data(xp.where(lowm, zero, U.data))
        L = self._wrap(sctype, L_raw, array=True, integral=True)
        Uu = self._wrap(sctype, U_raw, array=True, integral=True)
        LUA = self.np_matmul(L, self.np_matmul(Uu, A))
        LUA = self.output(LUA, raw=True)
        detLUA = _field_det_public(field, LUA)
        return self.div(detLUA, detU)

    def np_unit_vector(self, a, n):
        """Secure length-n unit vector with the 1 at secret position a
        (a reduced mod n), via rotating a random unit vector by a masked
        public offset (reference runtime.py:5002-5029).

        The mask-and-open runs on raw field shares (with the fixed-point
        scale divided out first, like the reference's ``a >>= f``), so
        fixed-point operands with integral values work exactly."""
        stype = type(a)
        field = stype.field
        f = stype.frac_length
        u = self.random.np_random_unit_vector(stype, n)
        su = self._share(u)
        # sum over the logical axis only (leading party axis on --sim)
        r = (su * field.array(np.arange(n, dtype=object))).sum(axis=-1)
        sa = self._share(a)
        if f:
            r = r >> f
            sa = sa >> f
        R = self._random(stype, 1 << self.options.sec_param)
        c = self.output(sa - r + (self._share(R) + field(1)) * field(n))
        c = int(np.asarray(c._decode()).reshape(-1)[0]) % n
        return self.np_roll(u, c)

    def np_matmul(self, a, b):
        """Secure matrix multiplication (one reshare round)."""
        stype = self._sectype(a, b)
        f = stype.frac_length
        a_int, b_int = self._integral(a), self._integral(b)
        both_sec = isinstance(a, sectypes.SecureObject) and \
            isinstance(b, sectypes.SecureObject)
        sa = self._share(a) if isinstance(a, sectypes.SecureObject) \
            else self._encode_public(stype, a)
        sb = self._share(b) if isinstance(b, sectypes.SecureObject) \
            else self._encode_public(stype, b)
        c = sa @ sb
        if f and (a_int or b_int):
            c = c >> f
        if both_sec:
            c = self._reshare(c)
        if f and not (a_int or b_int):
            c = self._trunc_field(c, f, stype.bit_length + f, stype)
        return self._wrap(stype, c, array=True, integral=a_int and b_int)

    def matrix_prod(self, A, B, tr=False):
        """Secure matrix product of lists-of-lists A and B.

        Either operand (not both) may be a public matrix of
        field elements / ints (reference runtime.py:2425-2479).
        """
        stype = self._sectype(*(A[0] + B[0]))

        def lift(M):
            flat = [x for row in M for x in row]
            if any(isinstance(x, sectypes.SecureObject) for x in flat):
                return self.np_fromlist(flat).reshape(len(M), len(M[0]))
            enc = self._encode_public(
                stype, np.array([list(row) for row in M], dtype=object))
            return self._wrap(stype, self._share_like(enc), array=True,
                              integral=all(self._integral(x) for x in flat))

        An = lift(A)
        Bn = lift(B)
        if tr:
            Bn = self.np_transpose(Bn)
        Cn = self.np_matmul(An, Bn)
        return [[self.np_getitem(Cn, (i, j))
                 for j in range(Cn.shape[1])] for i in range(Cn.shape[0])]

    def gauss(self, A, d, b, c):
        """Secure Gaussian elimination step A*d - outer(b, c) on a
        list-of-lists tableau: fused into one reshare (+ one truncation
        for fixed point), reference runtime.py:3985-4005."""
        n1, n2 = len(A), len(A[0])
        stype = self._sectype(A[0][0])
        f = stype.frac_length
        sa = self._share(self.np_fromlist([x for row in A for x in row]))
        sa = self._logical_reshape(sa, (n1, n2))
        sd = self._logical_reshape(
            self._share(d if isinstance(d, sectypes.SecureObject)
                        else stype(d)), (1, 1))
        sb = self._logical_reshape(self._share(self.np_fromlist(b)), (n1, 1))
        sc = self._logical_reshape(self._share(self.np_fromlist(c)), (1, n2))
        raw = sa * sd - sb * sc
        raw = self._reshare(raw)
        if f:
            raw = self._trunc_field(raw, f, stype.bit_length + f, stype)
        out = self._wrap(stype, raw, array=True, integral=not f)
        return [[self.np_getitem(out, (i, j)) for j in range(n2)]
                for i in range(n1)]

    def vector_add(self, x, y):
        return [self.add(a, b) for a, b in zip(x, y)]

    def vector_sub(self, x, y):
        return [self.sub(a, b) for a, b in zip(x, y)]

    def matrix_add(self, A, B, tr=False):
        return [[self.add(A[i][j], B[j][i] if tr else B[i][j])
                 for j in range(len(A[0]))] for i in range(len(A))]

    def matrix_sub(self, A, B, tr=False):
        return [[self.sub(A[i][j], B[j][i] if tr else B[i][j])
                 for j in range(len(A[0]))] for i in range(len(A))]

    # char-2 bitwise -------------------------------------------------------

    def and_(self, a, b):
        """Secure bitwise & over char-2 field coefficient vectors
        (reference runtime.py:1427-1429)."""
        stype = self._sectype(a, b)
        stype = getattr(stype, 'sectype', stype)
        if getattr(stype, 'field', None) is not None and \
                stype.field.order == 2:
            # GF(2): bitwise & IS field multiplication (1 round, no
            # bit-decomposition needed — the hot path of sha3/aes)
            return self.mul(a, b)
        if isinstance(a, sectypes.SecureArray) or \
                isinstance(b, sectypes.SecureArray):
            return self.np_from_bits(
                self.np_multiply(self.np_to_bits(a), self.np_to_bits(b)))
        return self.from_bits(self.schur_prod(self.to_bits(a),
                                              self.to_bits(b)))

    def xor(self, a, b):
        """Secure bitwise ^ (char-2 fields: addition)."""
        return self.add(a, b)

    def or_(self, a, b):
        """Secure bitwise | = a ^ b ^ (a & b) (char 2,
        reference runtime.py:1439-1441)."""
        return self.add(self.add(a, b), self.and_(a, b))

    def invert(self, a):
        """Secure bitwise ~: flip every coefficient, i.e. a + (q-1)
        (char 2, reference runtime.py:1435-1437)."""
        stype = self._sectype(a)
        ones = self._encode_public(stype, stype.field.order - 1)
        return self._wrap(stype, self._share(a) + ones,
                          array=self._is_array_op(a), integral=True)

    def if_else(self, c, x, y):
        """Secure selection c*x + (1-c)*y for c in {0, 1}."""
        if isinstance(c, sectypes.SecureFixedPoint) and not c.integral:
            raise ValueError('condition must be integral')
        if x is y:  # reference runtime.py:2344-2345
            return x
        if isinstance(x, list):
            return [self.if_else(c, xi, yi) for xi, yi in zip(x, y)]
        d = self.sub(x, y) if isinstance(x, sectypes.SecureObject) or \
            isinstance(y, sectypes.SecureObject) else x - y
        return self.add(self.mul(c, d), y if isinstance(y, sectypes.SecureObject)
                        else self._wrap(self._sectype(c),
                                        self._encode_public(self._sectype(c), y),
                                        array=False, integral=self._integral(y)))

    def if_swap(self, c, x, y):
        """Secure swap: [x, y] if c == 0 else [y, x].

        Lists swap elementwise (reference runtime.py:2378-2388).
        """
        if isinstance(c, sectypes.SecureFixedPoint) and not c.integral:
            raise ValueError('condition must be integral')
        if isinstance(x, list):
            d = [c * (yi - xi) for xi, yi in zip(x, y)]
            return [[xi + di for xi, di in zip(x, d)],
                    [yi - di for yi, di in zip(y, d)]]
        d = c * (y - x)  # operators coerce public x/y (incl. both public)
        return [x + d, y - d]

    # ======================================================================
    # comparison layer (reference: runtime.py:1443-1559, 3552-3693)
    # ======================================================================

    _pax = 0  # leading party axes in share arrays (1 on the simulator)

    def _logical_reshape(self, share, shape):
        """Reshape the logical dims of a share, keeping party axes."""
        if isinstance(shape, int):
            shape = (shape,)
        lead = share.shape[:self._pax]
        return share.reshape(lead + tuple(shape))

    def _logical_flat(self, share):
        lead = share.shape[:self._pax]
        return share.reshape(lead + (-1,))

    def np_sgn(self, a, l=None, LT=False, EQ=False):
        """Secure elementwise signum of a (Toft-style masked comparison).

        Returns -1/0/1; LT=True gives the a<0 bit; EQ=True the a==0 bit.
        Reference: runtime.py:3622-3693 (np_sgn).
        """
        assert not (LT and EQ)
        stype = self._sectype(a)
        Zp = stype.field
        ctx = Zp.array.ctx
        f = stype.frac_length
        l = l or stype.bit_length
        k = self.options.sec_param
        shape = a.shape if isinstance(a, sectypes.SecureArray) else ()
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1

        rb_all = self.np_random_bits(Zp, (l + int(not EQ)) * n)
        if not EQ:
            s_sign = self._logical_flat(rb_all)[..., l * n:] * 2 - 1  # (P?, n)
        rb = self._logical_reshape(self._logical_flat(rb_all)[..., :l * n],
                                   (n, l))
        r_modl = self._dot_pow2_last(rb)  # sum_j rb[..., j] 2^j
        r_divl = self._np_randoms(Zp, n, 1 << k)
        a_sh = self._logical_reshape(self._share(a), (n,))
        a_r = a_sh + ((1 << l) + r_modl)
        c_full = self.output(a_r + (r_divl << l))    # public (n,)
        nat = self._sgn_prepare_native(
            Zp, c_full, rb, None if EQ else s_sign, n, l,
            want_e=not EQ, want_x1=not LT)
        if nat is not None:
            # the whole between-rounds bit algebra ran as one C pass
            E, X1, cl = nat
            z = cl - a_r
            if not EQ:
                prod_e = self._prod_last_axis(E)
                g = self._is_zero_public_dev(prod_e)
                g_pm = Zp.array.from_uint32(
                    np.where(np.asarray(g), np.uint32(1), np.uint32(0)))
                h = s_sign - (s_sign * g_pm) * 2 + 3
                z = (z + (h << (l - 1))) >> l
            if not LT:
                h_all = self._prod_last_axis(X1)
                if EQ:
                    z = h_all
                else:
                    z = (h_all - 1) * (z * 2 - 1)
                    z = self._reshare(z)
        else:
            c = c_full.mod_pow2(l)
            z = c - a_r
            c_bits_u = c.to_bits_public(l)           # uint32 (n, l)
            c_bits = Zp.array.from_uint32(c_bits_u)  # public field (n, l)
            xor = c_bits + rb - (c_bits * rb) * 2    # secure (P?, n, l)

            if not EQ:  # Toft trick, fully vectorized over the bit axis
                last_ax = len(xor.shape) - 1
                incl = xor.cumsum(axis=last_ax)              # (P?, n, l)
                total = incl[..., l - 1]                     # (P?, n)
                total_col = self._logical_reshape(total, (n, 1))
                suffix = total_col - incl     # sums[i] = sum_{j>i} xor_j
                s_col = self._logical_reshape(s_sign, (n, 1))
                e_bits = s_col + (rb - c_bits) + suffix * 3  # (P?, n, l)
                e_last = self._logical_reshape(s_sign - 1 + total * 3,
                                               (n, 1))
                E = _concat_axis(Zp, [e_bits, e_last], -1)   # (P?, n, l+1)
                prod_e = self._prod_last_axis(E)
                g = self._is_zero_public_dev(prod_e)  # bool (n,)
                xp = jnp if _lazyjax.is_jax_array(g) else np
                g_pm = Zp.array.from_uint32(
                    xp.where(g, xp.uint32(1), xp.uint32(0)))  # 0/1 public
                # h = 3 + s - 2*g*s
                h = s_sign - (s_sign * g_pm) * 2 + 3
                z = (z + (h << (l - 1))) >> l

            if not LT:
                ones = Zp.array(np.ones(1, dtype=object))
                h_all = self._prod_last_axis(ones - xor)  # (P?, n)
                if EQ:
                    z = h_all
                else:
                    z = (h_all - 1) * (z * 2 - 1)
                    z = self._reshare(z)

        if f:
            z = z << f
        z = self._logical_reshape(z, shape) if shape else \
            self._logical_reshape(z, (1,))[..., 0]
        return self._wrap(stype, z, array=bool(shape), integral=True)

    def _sgn_prepare_native(self, Zp, c_open, rb, s_sign, n, l,
                            want_e, want_x1):
        """One-pass native bit algebra for np_sgn (hfg_sgn_prepare):
        returns (E, X1, cl) field arrays (None where not requested), or
        None when the native path does not apply."""
        if getattr(self, 'is_simulator', False) or l > 64 or n == 0:
            return None
        hf = self._hf(Zp)
        if hf is None:
            return None
        flats = []
        for a in (c_open, rb) + ((s_sign,) if s_sign is not None else ()):
            if not isinstance(a, finfields.FiniteFieldArray) or \
                    not isinstance(a.data, np.ndarray):
                return None
            try:
                flats.append(hf.mont_u64(a.data))
            except (TypeError, OverflowError):
                return None
        from mpyc_tpu.ops import hostfield as _hfm
        sf = flats[2] if s_sign is not None else None
        E, X1, cl = _hfm.sgn_prepare(hf, flats[0], flats[1], sf, n, l,
                                     want_e, want_x1)
        rep = self._hf_rep(hf, n * (l + 1))
        acls = Zp.array
        return (acls.from_data(rep(E, (n, l + 1))) if E is not None
                else None,
                acls.from_data(rep(X1, (n, l))) if X1 is not None else None,
                acls.from_data(rep(cl, (n,))))

    def _prod_last_axis(self, s):
        """Secure product along the last logical axis (log depth, reshared)."""
        while s.shape[-1] > 1:
            w = s.shape[-1]
            half = w // 2
            x = s[..., :half] * s[..., half:2 * half]
            x = self._reshare(x)
            if w % 2:
                # x.field (instance access) forces a pipeline LazyShare
                x = _concat_axis(x.field, [x, s[..., 2 * half:]], -1)
            s = x
        return s[..., 0]

    def _nonzero_random(self, field):
        """Secret sharing of a uniformly random NONZERO field element.

        Pool-based: a refill samples 2K randoms, reshares + opens the K
        pairwise products in one batched round each, and keeps the r_i
        whose opened r_i*s_i is nonzero (so r_i != 0 is verified without
        revealing r_i). Each pooled blinder is used once. All parties run
        the same deterministic pop/refill sequence, so the pc-tagged
        rounds stay aligned."""
        pool = self._nz_pool.get(field.modulus)
        while not pool:
            K = 32
            rs = self._np_randoms(field, 2 * K)
            r, s = rs[..., :K], rs[..., K:]
            # degree-2t product opened directly: ONE round per refill
            opened = self.output(r * s, threshold=2 * self.threshold)
            vals = opened.value.reshape(-1)
            pool = [r[..., i] for i in range(K) if int(vals[i]) != 0]
            self._nz_pool[field.modulus] = pool
        return pool.pop()

    def _is_zero_public_dev(self, share):
        """Device-side public zero test of a secret sharing (any shape).

        Like is_zero_public (runtime.py:879-929) but returns a bool device
        array, avoiding host sync inside vectorized protocols. Each element
        is blinded with the same nonzero random r (sufficient: the opened
        values a_i * r are uniformly random for a_i != 0).

        Verified-nonzero blinders come from a per-field pool refilled in
        one batched round (sample K pairs, open r_i*s_i, keep r_i with
        nonzero product): the per-call cost drops from 4 comm rounds to 2,
        and comparisons (np_sgn) make one such call each.
        """
        field = share.field
        r = self._nonzero_random(field)
        pad = len(share.shape) - len(r.shape)
        if pad:
            r = r.reshape(r.shape + (1,) * pad)
        # open the degree-2t blinded product directly (threshold 2t, no
        # degree reduction — reference runtime.py:879-929): ONE round
        b = share * r
        c = self.output(b, threshold=2 * self.threshold)
        return c.field.array.ctx.is_zero(c.data)

    def sgn(self, a, l=None, LT=False, EQ=False):
        """Secure signum of scalar a."""
        return self.np_sgn(a, l=l, LT=LT, EQ=EQ)

    def lt(self, a, b):
        """Secure comparison a < b."""
        return self.sgn(self.sub(a, b), LT=True)

    def ge(self, a, b):
        """Secure comparison a >= b."""
        return 1 - self.lt(a, b)

    def np_less(self, a, b):
        return self.np_sgn(self.sub(a, b), LT=True)

    def eq(self, a, b):
        """Secure comparison a == b."""
        return self.is_zero(self.sub(a, b))

    def np_equal(self, a, b):
        d = self.sub(a, b)
        stype = self._sectype(d)
        if issubclass(stype, sectypes.SecureFiniteField):
            return 1 - self.pow(d, stype.field.order - 1)
        if stype.bit_length / 2 > self.options.sec_param >= 8 and \
                stype.field.order % 4 == 3:
            return self._np_is_zero(d)
        return self.np_sgn(d, EQ=True)

    def is_zero(self, a):
        """Secure zero test a == 0."""
        stype = self._sectype(a)
        if issubclass(stype, sectypes.SecureFiniteField):
            return 1 - self.pow(a, stype.field.order - 1)
        if stype.bit_length / 2 > self.options.sec_param >= 8 and \
                stype.field.order % 4 == 3:
            return self._np_is_zero(a)
        return self.sgn(a, EQ=True)

    def _np_is_zero(self, a):
        """Probabilistic zero test a la [NO07] (reference runtime.py:3582)."""
        stype = self._sectype(a)
        Zp = stype.field
        shape = a.shape if isinstance(a, sectypes.SecureArray) else ()
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        k = self.options.sec_param

        z = self.np_random_bits(Zp, k * n)
        r = self._np_randoms(Zp, k * n)
        u2 = self._reshare(r * r)
        r = self._np_randoms(Zp, k * n)
        a_sh = self._logical_reshape(self._share(a), (1, n))
        z = self._logical_reshape(z, (k, n))
        r = self._logical_reshape(r, (k, n))
        u2 = self._logical_reshape(u2, (k, n))
        ones = Zp.array(np.ones(1, dtype=object))
        c = a_sh * r + (ones - z * 2) * u2
        c = self.output(c, threshold=2 * self.threshold)  # public (k, n)
        # c == 0 -> force 1; c square -> 1-z else z
        is_z = Zp.array.ctx.is_zero(c.data)
        leg = Zp.array.ctx.legendre(c.data)           # (k, n) in {-1,0,1}
        sq = leg >= 0
        xp = np if isinstance(sq, np.ndarray) else jnp
        sq_f = Zp.array.from_uint32(xp.where(sq, xp.uint32(1),
                                             xp.uint32(0)))
        # e_{i,j} = z or 1-z per sq; then force 1 where c==0
        cand = sq_f + z - (sq_f * z) * 2  # sq XOR z? want: sq-> 1-z, !sq-> z
        isz_f = Zp.array.from_uint32(xp.where(is_z, xp.uint32(1),
                                              xp.uint32(0)))
        cand = cand * (ones - isz_f) + isz_f  # c==0 -> 1
        # AND over k: move k last and multiply down
        sw = cand.swapaxes(self._pax + 0, self._pax + 1)  # (P?, n, k)
        e = self._prod_last_axis(sw)
        if stype.frac_length:
            e = e << stype.frac_length
        e = self._logical_reshape(e, shape) if shape else \
            self._logical_reshape(e, (1,))[..., 0]
        return self._wrap(stype, e, array=bool(shape), integral=True)

    def np_is_zero_public(self, a):
        """Public elementwise zero test (numpy bool array)."""
        return self.is_zero_public(a)

    def np_all(self, a, axis=None):
        """Secure all(): product of 0/1 values over axes
        (reference runtime.py:2206-2214: np_all == np_prod)."""
        s = self._share(a)
        stype = self._sectype(a)
        f = stype.frac_length
        if f:
            # integral fxp bits are multiples of 2^f: exact rescale to the
            # 0/1 domain so the product needs no per-level truncation
            # (reference runtime.py:2160-2168 rshifts each level instead)
            s = s >> f
        nd = len(s.shape) - self._pax
        if axis is None:
            s = self._logical_flat(s)
        else:
            axes = (axis % nd,) if isinstance(axis, int) else \
                tuple(sorted(i % nd for i in axis))
            data = s.data
            _xp = np if isinstance(data, np.ndarray) else jnp
            for off, ax in enumerate(axes):
                data = _xp.moveaxis(data, ax + self._pax - off,
                                    self._pax + nd - 1)
            s = s.from_data(data)
            keep = s.shape[self._pax:self._pax + nd - len(axes)]
            s = self._logical_reshape(s, tuple(keep) + (-1,))
        out = self._prod_last_axis(s)
        if f:
            out = out << f
        return self._wrap(stype, out, array=bool(out.shape[self._pax:]),
                          integral=True)

    def all(self, x):
        """Secure all() over a list of 0/1 secure numbers."""
        if isinstance(x, sectypes.SecureArray):
            return self.np_all(x)
        x = list(x)
        if not x:
            return 1
        if any(isinstance(a, sectypes.SecureFixedPoint) and not a.integral
               for a in x):  # reference runtime.py:2153-2154
            raise ValueError('nonintegral fixed-point number')
        return self.np_all(self.np_fromlist(x))

    def any(self, x):
        """Secure any() over 0/1 values: 1 - all(1-x)."""
        if isinstance(x, sectypes.SecureArray):
            return 1 - self.np_all(1 - x)
        x = list(x)
        if not x:
            return 0
        return 1 - self.all([1 - a for a in x])

    def np_prod(self, a, axis=None):
        """Secure product over an axis (log depth with resharing)."""
        return self.np_all(a, axis=axis) if False else self._np_prod(a, axis)

    def _np_prod(self, a, axis):
        # log-depth pairwise products via mul (handles fxp truncation and
        # integral flags; reference runtime.py:2198-2204)
        a, _ = self._reduce_prep(a, axis)
        while (n := a.shape[-1]) > 1:
            n0 = n % 2
            m = self.mul(self.np_getitem(a, (..., slice(n0, (n + 1) // 2))),
                         self.np_getitem(a, (..., slice((n + 1) // 2, n))))
            if n0:
                m = self._np_concat_last(
                    self.np_getitem(a, (..., slice(0, 1))), m)
            a = m
        return self.np_getitem(a, (..., 0))

    def np_absolute(self, a, l=None):
        return self.mul(self.np_sgn(a, l=l, LT=True) * -2 + 1, a)

    def abs(self, a, l=None):
        """Secure absolute value of a."""
        return self.mul(self.sgn(a, l=l, LT=True) * -2 + 1, a)

    # -- bit extraction / binary arithmetic --------------------------------

    def lsb(self, a):
        """Secure least significant bit of a (a la [ST06])."""
        return self.np_lsb(a)

    def np_lsb(self, a):
        stype = self._sectype(a)
        Zp = stype.field
        l = stype.bit_length
        k = self.options.sec_param
        f = stype.frac_length
        shape = a.shape if isinstance(a, sectypes.SecureArray) else ()
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1

        b = self.np_random_bits(Zp, n)              # raw field bits
        r = self._np_randoms(Zp, n, 1 << (l + k - 1))
        a_sh = self._logical_reshape(self._share(a), (n,))
        if f:
            a_in = a_sh >> f if False else a_sh
        c = self.output(a_sh + ((1 << l) + (r << 1) + b))
        c_lsb_u = c.to_bits_public(1)[..., 0]       # uint32 (n,)
        c_lsb = Zp.array.from_uint32(c_lsb_u)
        ones = Zp.array(np.ones(1, dtype=object))
        x = c_lsb + b - (c_lsb * b) * 2             # xor
        if f:
            x = x << f
        x = self._logical_reshape(x, shape) if shape else \
            self._logical_reshape(x, (1,))[..., 0]
        return self._wrap(stype, x, array=bool(shape), integral=True)

    def mod(self, a, b):
        """Secure modulo reduction a mod b (public b)."""
        stype = self._sectype(a)
        f = stype.frac_length
        # work in the raw share domain (reference runtime.py:1825-1838):
        # for secfxp the divisor is b scaled by 2^f, so the raw result
        # directly represents a mod b (fractional part included).
        if isinstance(b, sectypes.SecureObject):
            b_raw = int(self.run(self.output(b, raw=True)))  # public value
        elif isinstance(b, float):
            b_raw = round(b * (1 << f))
        else:
            b_raw = int(b) << f
        if b_raw == 2:
            # lsb returns the fxp-encoded 0/1 bit; the residue lives in the
            # raw domain, so scale by 2^-f (reference runtime.py:1837-1838)
            r = self.lsb(a)
            return self.mul(r, 2 ** -f) if f else r
        return self._mod(a, b_raw)  # _mod already returns the raw domain

    def _mod(self, a, b: int):
        """Secure mod for public raw-domain b a la [GMS10]
        (reference runtime.py:1840-1880)."""
        stype = self._sectype(a)
        Zp = stype.field
        l = stype.bit_length
        k = self.options.sec_param
        shape = a.shape if isinstance(a, sectypes.SecureArray) else ()
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1

        lb = (b - 1).bit_length()  # bits needed for r < b... use randbelow
        r_bits = self._randbelow_bits(Zp, b, n)     # (P?, n, lb) secure bits
        lb = r_bits.shape[-1]
        r_modb = None
        for j in range(lb):
            term = r_bits[..., j] << j
            r_modb = term if r_modb is None else r_modb + term
        r_divb = self._np_randoms(Zp, n, 1 << k)
        a_sh = self._logical_reshape(self._share(a), (n,))
        c = self.output(a_sh + ((1 << l) - ((1 << l) % b) + r_divb * b
                                - r_modb))
        # c mod b on device: via host (public, small)
        c_vals = np.array([int(v) % b for v in
                           np.atleast_1d(c.value.reshape(-1))], dtype=object)
        c_vals[c_vals == 0] = b
        c_pub = np.array([int(v) for v in c_vals], dtype=np.uint32) \
            if b < (1 << 31) else None
        # secure comparison z <=> r_modb >= b - c
        s_all = self.np_random_bits(Zp, n, signed=True)
        s_sign = s_all
        sums = [None] * lb
        sum_acc = None
        bc_bits = np.stack([((b - np.array([int(v) for v in c_vals],
                                           dtype=object)) >> i) & 1
                            for i in range(lb)], axis=-1)  # (n, lb) 0/1
        host = isinstance(r_bits.data, np.ndarray)
        bc_dev = Zp.array.from_uint32(
            bc_bits.astype(np.uint32) if host
            else jnp.asarray(bc_bits.astype(np.uint32)))
        xor = bc_dev + r_bits - (bc_dev * r_bits) * 2
        for i in range(lb - 1, -1, -1):
            sums[i] = sum_acc
            x_i = xor[..., i]
            sum_acc = x_i if sum_acc is None else sum_acc + x_i
        e_list = []
        for i in range(lb):
            e_i = s_sign + (r_bits[..., i] - bc_dev[..., i])
            if sums[i] is not None:
                e_i = e_i + sums[i] * 3
            e_list.append(e_i)
        e_list.append(s_sign + 1 + (sum_acc * 3 if sum_acc is not None
                                    else 0))
        E = _concat_axis(Zp, [self._logical_reshape(x, (n, 1))
                              for x in e_list], -1)
        g = self._is_zero_public_dev(self._prod_last_axis(E))
        xp = np if isinstance(g, np.ndarray) else jnp
        g_f = Zp.array.from_uint32(xp.where(g, xp.uint32(1),
                                            xp.uint32(0)))
        # z = (1 - s)/2 if g else (1 + s)/2  ->  z = (1 + s - 2 g s)/2
        z = (s_sign - (s_sign * g_f) * 2 + 1) >> 1
        c_dev = Zp.array(np.array(list(c_vals), dtype=object))
        res = c_dev + r_modb - z * b
        res = self._logical_reshape(res, shape) if shape else \
            self._logical_reshape(res, (1,))[..., 0]
        return self._wrap(stype, res, array=bool(shape),
                          integral=self._integral(a))

    def _randbelow_bits(self, field, b: int, n):
        """Secure uniform r < b as bits (rejection-free for powers of 2;
        rejection loop otherwise; reference mpyc/random.py:48-82)."""
        lb = (b - 1).bit_length()
        if b & (b - 1) == 0:
            bits = self.np_random_bits(field, n * lb)
            return self._logical_reshape(bits, (n, lb))
        # rejection: draw lb bits; value must be < b
        out = [None] * n
        remaining = list(range(n))
        parts = None
        while remaining:
            h = len(remaining)
            bits = self.np_random_bits(field, h * lb)
            bits = self._logical_reshape(bits, (h, lb))
            val = None
            for j in range(lb):
                term = bits[..., j] << j
                val = term if val is None else val + term
            # compare val < b publicly? cannot — val is secret. Use masked
            # comparison via opening val + (we only need acceptance, which
            # leaks only accept/reject — same as reference _randbelow).
            lt_bits = self._bits_lt_public(bits, b)
            acc = self.output(lt_bits)               # public 0/1 (h,)
            acc_np = np.array([int(v) for v in
                               np.atleast_1d(acc.value.reshape(-1))])
            keep = [i for i, ok in enumerate(acc_np) if ok]
            sel = np.array(keep, dtype=np.int64)
            if len(keep):
                kept = bits[..., sel, :] if self._pax else bits[sel, :]
                if parts is None:
                    parts = []
                parts.append((list(np.array(remaining)[sel]), kept))
            remaining = [r for i, r in enumerate(remaining)
                         if i not in set(keep)]
        # assemble in order
        field_cls = field.array
        d0 = parts[0][1].data
        xp = np if isinstance(d0, np.ndarray) else jnp
        total = xp.zeros(d0.shape[:self._pax] + (n, lb)
                         + d0.shape[len(parts[0][1].shape):],
                         dtype=d0.dtype if d0.dtype == object else np.uint32)
        assembled = field_cls.from_data(total)
        for idxs, kept in parts:
            for slot, i in enumerate(idxs):
                piece = kept[..., slot, :] if self._pax else kept[slot]
                assembled = self._at_set_logical(assembled, i, piece)
        return assembled

    def _at_set_logical(self, arr, i, piece):
        idx = (slice(None),) * self._pax + (i,)
        return arr.from_data(finfields._data_at_set(arr.data, idx, piece.data))

    def _bits_lt_public(self, bits, b: int):
        """Secure test [bits] < b for public b, bits LSB-first (n, lb)."""
        lb = bits.shape[-1]
        field = bits.field
        ones = field.array(np.ones(1, dtype=object))
        # standard MSB-down scan: lt = OR_i (b_i=1 & x_i=0 & prefix_eq)
        lt = None
        eq = None
        for i in range(lb - 1, -1, -1):
            b_i = (b >> i) & 1
            x_i = bits[..., i]
            if b_i:
                term = (ones - x_i) if eq is None else eq * (ones - x_i)
                if term is not eq:
                    pass
                term = self._reshare(term) if eq is not None else term
                lt = term if lt is None else lt + term
                eq_new = x_i if eq is None else self._reshare(eq * x_i)
            else:
                eq_new = (ones - x_i) if eq is None else \
                    self._reshare(eq * (ones - x_i))
            eq = eq_new
        return lt if lt is not None else bits[..., 0] * 0

    def to_bits(self, a, l=None):
        """Secure bit decomposition: list of l secure bits (LSB first)."""
        stype = self._sectype(a)
        if (l if l is not None else stype.bit_length) == 0:
            return []  # zero-bit types (reference runtime.py:4292)
        arr = self.np_to_bits(a, l)
        n_bits = arr.shape[-1]
        return [self.np_getitem(arr, (..., i)) if isinstance(a, sectypes.SecureArray)
                else self._bit_item(arr, i) for i in range(n_bits)]

    def _bit_item(self, arr, i):
        stype = arr.sectype if isinstance(arr, sectypes.SecureArray) \
            else type(arr)
        share = self._share(arr)
        piece = share[..., i]
        if piece.shape[self._pax:] == (1,):
            piece = piece[..., 0]
        return self._wrap(stype, piece, array=False, integral=True)

    def np_to_bits(self, a, l=None):
        """Secure bit decomposition of a: shape a.shape + (l,)."""
        stype = self._sectype(a)
        if l is None:
            l = stype.bit_length
        assert l <= stype.bit_length + stype.frac_length
        field = stype.field
        f = stype.frac_length
        shape = a.shape if isinstance(a, sectypes.SecureArray) else ()
        rshift_f = f and self._integral(a)
        l_eff = l
        if rshift_f:
            if f >= l:
                zero = field.array(np.zeros(shape + (l,), dtype=object))
                return self._wrap(stype, self._share_like(zero),
                                  array=True, integral=True)
            l_eff = l - f
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1

        if issubclass(stype, sectypes.SecureFiniteField):
            if field.characteristic == 2:
                return self._np_to_bits_char2(a, l_eff, stype, shape, n)
            if field.ext_deg > 1:
                raise TypeError('Binary field or prime field required.')
            # prime secfld: bit-decompose via secure integers
            # (reference runtime.py:4307-4317)
            xs = self.np_tolist(self.np_flatten(a)) \
                if isinstance(a, sectypes.SecureArray) else [a]
            xs = self.convert(xs, self.SecInt(l=1 + stype.bit_length))
            bits = self.np_to_bits(self.np_fromlist(xs), l=l_eff)
            flat = self.np_tolist(self.np_reshape(bits, (n * l_eff,)))
            flat = self.convert(flat, stype)
            return self.np_reshape(self.np_fromlist(flat), shape + (l_eff,))

        k = self.options.sec_param
        r_bits = self.np_random_bits(field, n * l_eff)
        r_bits = self._logical_reshape(r_bits, (n, l_eff))
        r_modl = self._dot_pow2_last(r_bits)
        r_divl = self._np_randoms(field, n,
                                  1 << (stype.bit_length + k - l_eff))
        a_sh = self._logical_reshape(self._share(a), (n,))
        if rshift_f:
            a_sh = a_sh >> f
        c = self.output(a_sh + ((1 << stype.bit_length)
                                + (r_divl << l_eff) - r_modl))
        c = c.mod_pow2(l_eff)
        c_bits_u = c.to_bits_public(l_eff)           # (n, l_eff) uint32
        a_bits = self._np_add_bits_shares(r_bits, c_bits_u, stype)
        if f:
            a_bits = a_bits << f  # fxp bits are proper 0/1 fxp values
        if rshift_f:
            zshape = a_bits.shape[:self._pax] + (n, f)
            if isinstance(a_bits.data, np.ndarray):
                zeros = field.array(np.zeros(zshape, dtype=object))
            else:
                zeros = field.array.from_data(jnp.zeros(
                    zshape + (field.array.ctx.L,), dtype=jnp.uint32))
            a_bits = _concat_axis(field, [zeros, a_bits], -1)
        out = self._logical_reshape(a_bits, shape + (l,))
        return self._wrap(stype, out, array=True, integral=True)

    def _np_to_bits_char2(self, a, l, stype, shape, n):
        field = stype.field
        r_bits = self.np_random_bits(field, n * l)
        r_bits = self._logical_reshape(r_bits, (n, l))
        # char-2: int 2^j encodes x^j, so the same pow2 dot applies
        r_modl = self._dot_pow2_last(r_bits)
        a_sh = self._logical_reshape(self._share(a), (n,))
        c = self.output(a_sh + r_modl)
        # public bit extraction stays where the data is: packed GF(2^l)
        # values hold bit j at 2^j, so (c >> j) & 1 IS the j-th bit as a
        # {0,1} field element (a device pull here cost ~160 ms per call
        # through the TPU tunnel — 12 s of a warm 17 s np_aes encrypt)
        d = c.data.reshape((-1,))
        xp = np if isinstance(d, np.ndarray) else jnp
        c_bits = xp.stack([(d >> xp.uint32(i)) & xp.uint32(1)
                           for i in range(l)], axis=-1)
        c_dev = field.array.from_data(c_bits.astype(xp.uint32))
        out = r_bits + c_dev
        out = self._logical_reshape(out, shape + (l,))
        return self._wrap(stype, out, array=True, integral=True)

    def _np_add_bits_shares(self, a_bits, c_bits_u, stype):
        """Binary addition of secure bits a and public bits c.

        Carry-lookahead prefix network a la the reference np_add_bits
        (runtime.py:4302-4333), with the public operand folded in locally.
        """
        field = stype.field
        c_f = field.array.from_uint32(c_bits_u)      # public bits (n, l)
        return self._add_bits_prefix(a_bits, c_f)

    def _add_bits_prefix(self, x, y):
        """Prefix-carry addition of two bit arrays (either may be public)."""

        def f(i, j, high=False):
            nn = j - i
            if nn == 1:
                x_i = x[..., i:i + 1]
                y_i = y[..., i:i + 1]
                c = self._mul_bits(x_i, y_i)
                if high:
                    d = x_i + y_i - c * 2
                    return c, d
                return c
            h = i + nn // 2
            e1 = f(i, h, high=high)
            c2, d2 = f(h, j, high=True)
            c1 = e1[0] if high else e1
            carry = c1[..., -1:]
            c2 = c2 + self._mul_bits(carry, d2)
            c = _concat_axis(x.field, [c1, c2], -1)
            if high:
                d1 = e1[1]
                d2 = self._mul_bits(d1[..., -1:], d2)
                d = _concat_axis(x.field, [d1, d2], -1)
                return c, d
            return c

        n_bits = x.shape[-1]
        c = f(0, n_bits)
        # sum bits: x + y - 2c + c_shifted
        c_1 = c.roll(1, axis=-1)
        zero = x.field.array(np.zeros(1, dtype=object))
        c_1 = c_1.at_set((..., 0), zero)
        return x + y - c * 2 + c_1

    def _mul_bits(self, u, v):
        """Multiply bit arrays; reshare only if both secret (heuristic:
        public operands have no party axis in sim / are used directly)."""
        w = u * v
        return self._reshare(w)

    def from_bits(self, x):
        """Recover secure number from list of secure bits (LSB first)."""
        if x == []:
            return 0
        stype = self._sectype(*x)
        char2 = stype.field.characteristic == 2
        acc = None
        for j, xb in enumerate(x):
            sh = self._share(xb)
            term = sh * (1 << j) if char2 else sh << j
            acc = term if acc is None else acc + term
        return self._wrap(stype, acc, array=False, integral=True)

    def np_from_bits(self, x):
        """Recover secure numbers from bit arrays (last axis = bits)."""
        stype = self._sectype(x)
        s = self._share(x)
        acc = self._dot_pow2_last(s)
        return self._wrap(stype, acc, array=bool(acc.shape[self._pax:]),
                          integral=True)

    def np_update(self, a, idx, value):
        """Functional update of secure array a at idx."""
        stype = self._sectype(a)
        s = self._share(a)
        v = self._share(value) if isinstance(value, sectypes.SecureObject) \
            else self._encode_public(stype, value)
        if self._pax and isinstance(idx, tuple):
            idx = (slice(None),) + idx
        elif self._pax:
            idx = (slice(None), idx)
        out = s.at_set(idx, v)
        return self._wrap(stype, out, array=True,
                          integral=self._integral(a) and
                          self._integral(value))

    def _share_like(self, field_arr):
        """Broadcast a logical field array to a share (sim adds party axis)."""
        return field_arr

    # ======================================================================
    # aggregates: min/max/sort (reference: runtime.py:1561-1774)
    # ======================================================================

    def min(self, *x, key=None):
        """Secure minimum (tournament tree of log-depth comparisons)."""
        if len(x) == 1:
            x = x[0]
        if iter(x) is x:
            x = list(x)
        n = len(x)
        if not n:
            raise ValueError('min() arg is an empty sequence')
        if n == 1:
            return x[0]
        if key is None:
            key = lambda a: a
        min0 = self.min(x[:n // 2], key=key)
        min1 = self.min(x[n // 2:], key=key)
        return self.if_else(key(min0) < key(min1), min0, min1)

    def max(self, *x, key=None):
        """Secure maximum."""
        if len(x) == 1:
            x = x[0]
        if iter(x) is x:
            x = list(x)
        n = len(x)
        if not n:
            raise ValueError('max() arg is an empty sequence')
        if n == 1:
            return x[0]
        if key is None:
            key = lambda a: a
        max0 = self.max(x[:n // 2], key=key)
        max1 = self.max(x[n // 2:], key=key)
        return self.if_else(key(max0) < key(max1), max1, max0)

    def min_max(self, *x, key=None):
        """Secure (min, max) in (3n-3)//2 comparisons (Pohl's bound)."""
        if len(x) == 1:
            x = x[0]
        x = list(x)
        n = len(x)
        if not n:
            raise ValueError('min_max() arg is an empty sequence')
        if key is None:
            key = lambda a: a
        for i in range(n // 2):
            a, b = x[i], x[-1 - i]
            x[i], x[-1 - i] = self.if_swap(key(a) >= key(b), a, b)
        return self.min(x[:(n + 1) // 2], key=key), \
            self.max(x[n // 2:], key=key)

    def argmin(self, *x, key=None):
        """Secure (argmin, min); first occurrence on ties."""
        if len(x) == 1:
            x = x[0]
        if iter(x) is x:
            x = list(x)
        if not x:
            raise ValueError('argmin() arg is an empty sequence')
        if key is None:
            key = lambda a: a
        return self._argminmax(x, key, lambda c0, c1: key(c1) < key(c0))

    def argmax(self, *x, key=None):
        """Secure (argmax, max); first occurrence on ties."""
        if len(x) == 1:
            x = x[0]
        if iter(x) is x:
            x = list(x)
        if not x:
            raise ValueError('argmax() arg is an empty sequence')
        if key is None:
            key = lambda a: a
        return self._argminmax(x, key, lambda c0, c1: key(c0) < key(c1))

    def _argminmax(self, x, key, better1):
        n = len(x)
        if n == 1:
            m = x[0]
            stype = type(m[0]) if isinstance(m, list) else type(m)
            return stype(0), m
        i0, m0 = self._argminmax(x[:n // 2], key, better1)
        i1, m1 = self._argminmax(x[n // 2:], key, better1)
        i1 = i1 + n // 2
        c = better1(m0, m1)
        a = self.if_else(c, i1, i0)
        m = self.if_else(c, m1, m0)
        return a, m

    def sorted(self, x, key=None, reverse=False):
        """Securely sorted list (Batcher merge-exchange; not stable)."""
        x = list(x)
        if len(x) < 2:
            return x
        if key is None:
            key = lambda a: a
        self._sort(x, key)
        if reverse:
            x.reverse()
        return x

    def _sort(self, x, key):
        """Batcher's merge-exchange sort (Knuth TAOCP 5.2.2M), in place."""
        n = len(x)
        t = (n - 1).bit_length()
        p = 1 << (t - 1)
        while p:
            d, q, r = p, 1 << (t - 1), 0
            while d:
                for i in range(n - d):
                    if i & p == r:
                        a, b = x[i], x[i + d]
                        x[i], x[i + d] = self.if_swap(key(a) < key(b), b, a)
                d, q, r = q - p, q >> 1, p
            p >>= 1
        return x

    def np_sort(self, a, axis=-1, key=None):
        """Sorted copy along axis (vectorized Batcher network)."""
        if axis is None:
            a = self.np_flatten(a)
            axis = 0
        else:
            a = self.np_copy(a)
        if key is None:
            key = lambda v: v
        n = a.shape[axis]
        if a.size == 0 or n <= 1:
            return a
        a = self.np_swapaxes(a, axis, -1)
        t = (n - 1).bit_length()
        p = 1 << (t - 1)
        while p:
            d, q, r = p, 1 << (t - 1), 0
            while d:
                I = np.fromiter((i for i in range(n - d) if i & p == r),
                                dtype=int)
                b0 = self.np_getitem(a, (..., I))
                b1 = self.np_getitem(a, (..., I + d))
                h = self.mul(self.np_less(key(b1), key(b0)),
                             self.sub(b1, b0))
                a = self.np_update(a, (..., I), self.add(b0, h))
                a = self.np_update(a, (..., I + d), self.sub(b1, h))
                d, q, r = q - p, q >> 1, p
            p >>= 1
        return self.np_swapaxes(a, axis, -1)

    def np_amin(self, a, axis=None, keepdims=False, **kwargs):
        """Secure minimum over axes (log-depth tournament)."""
        return self._np_extremum(a, axis, is_min=True, keepdims=keepdims)

    def np_amax(self, a, axis=None, keepdims=False, **kwargs):
        return self._np_extremum(a, axis, is_min=False, keepdims=keepdims)

    def _reduce_prep(self, a, axis):
        """Move the reduction axes last and flatten them into one trailing
        axis (the pattern of reference np_prod, runtime.py:2181-2196)."""
        nd = len(a.shape)
        if axis is None:
            axes = tuple(range(nd))
        elif isinstance(axis, int):
            axes = (axis % nd,)
        else:
            axes = tuple(sorted(i % nd for i in axis))
        order = [i for i in range(nd) if i not in axes] + list(axes)
        if order != list(range(nd)):
            a = self.np_transpose(a, axes=order)
        keep = tuple(a.shape[:nd - len(axes)])
        a = self.np_reshape(a, keep + (-1,))
        return a, axes

    def _np_extremum(self, a, axis, is_min, keepdims=False):
        orig_shape = a.shape
        a, axes = self._reduce_prep(a, axis)
        while a.shape[-1] > 1:
            n = a.shape[-1]
            half = n // 2
            b0 = self.np_getitem(a, (..., slice(0, half)))
            b1 = self.np_getitem(a, (..., slice(half, 2 * half)))
            c = self.np_less(b1, b0) if is_min else self.np_less(b0, b1)
            w = self.add(self.mul(c, self.sub(b1, b0)), b0)
            if n % 2:
                tail = self.np_getitem(a, (..., slice(2 * half, n)))
                w = self._np_concat_last(w, tail)
            a = w
        if keepdims:
            shape = tuple(1 if i in axes else s
                          for i, s in enumerate(orig_shape))
            return self.np_reshape(a, shape)
        return self.np_getitem(a, (..., 0))

    def _np_concat_last(self, a, b):
        stype = self._sectype(a, b)
        out = _concat_axis(stype.field, [self._share(a), self._share(b)], -1)
        return self._wrap(stype, out, array=True,
                          integral=self._integral(a) and self._integral(b))

    def np_argmin(self, a, axis=None, keepdims=False, key=None,
                  arg_unary=False, arg_only=True):
        """Secure indices of minimum values along an axis (reference
        runtime.py np_argmin): indices as numbers (or unit vectors when
        arg_unary), minimum values included when arg_only=False; first
        occurrence is returned on ties."""
        return self._np_argminmax(a, axis, keepdims, key, arg_unary,
                                  arg_only, is_min=True)

    def np_argmax(self, a, axis=None, keepdims=False, key=None,
                  arg_unary=False, arg_only=True):
        """Secure indices of maximum values along an axis (reference
        runtime.py np_argmax); see np_argmin."""
        return self._np_argminmax(a, axis, keepdims, key, arg_unary,
                                  arg_only, is_min=False)

    def _np_argminmax(self, a, axis, keepdims, key, arg_unary, arg_only,
                      is_min):
        """Shared np_argmin/np_argmax engine with the reference's exact
        shape semantics (reference runtime.py:3695-3791), including
        multi-component comparison keys: when key.size = s > 1, the last
        axis of a (of size s) holds the key components (e.g. numerator,
        denominator for SecureFraction) and the reduction runs over the
        next-to-last axis; the returned extrema then include that
        component axis."""
        ks = getattr(key, 'size', 1) if key is not None else 1
        assert ks == 1 or ks == a.shape[-1]
        shape = a.shape
        size = int(np.prod(shape)) if shape else 1
        ndim = a.ndim - ks + 1 if ks > 1 else a.ndim
        if axis is None:
            if ks == 1:
                a = self.np_reshape(a, (1, size))
            else:
                a = self.np_reshape(a, (1, size // ks, ks))
        else:
            if ks == 1:
                a = self.np_swapaxes(a, axis, -1)
                a = self.np_reshape(a, (-1, a.shape[-1]))
            else:
                assert (axis + 1) % a.ndim != 0  # key axis itself not valid
                a = self.np_swapaxes(a, axis, -2)
                a = self.np_reshape(a, (-1, a.shape[-2], ks))
        u, m = self._np_argext(a, is_min, key, ks)
        if not arg_unary:
            u = self.np_sum(
                self.mul(u, np.arange(u.shape[1], dtype=object)), axis=-1)
        if axis is None:
            if not arg_unary and keepdims:
                u = self.np_reshape(u, (1,) * ndim)
            else:
                u = self.np_getitem(u, 0)
        else:
            shape = list(shape)
            if ks > 1:
                del shape[-1]
            if arg_unary:
                shape[axis], shape[-1] = shape[-1], shape[axis]
            elif keepdims:
                shape[axis] = 1
            else:
                del shape[axis]
            u = self.np_reshape(u, tuple(shape))
            if arg_unary:
                u = self.np_swapaxes(u, axis, -1)
        if arg_only:
            return u

        if axis is None:
            if keepdims:
                m = self.np_reshape(m, (1,) * ndim)
            else:
                m = self.np_getitem(m, (0, 0))
        elif keepdims:
            if arg_unary:
                shape[axis], shape[-1] = shape[-1], shape[axis]
                shape[axis] = 1
            if ks > 1:
                shape = shape + [ks]
            m = self.np_reshape(m, tuple(shape))
        return u, m

    def _np_argext(self, a, is_min, key, ks=1):
        """(unit vector u, extremum m) along axis 1 of 2D a (3D with a
        trailing key-component axis when ks > 1); odd-even pairing so the
        FIRST occurrence wins on ties (reference runtime.py
        _np_argmin/_np_argmax :3793-3821)."""
        stype = self._sectype(a)
        n = a.shape[1]
        if n == 1:
            u = self._wrap(stype, self._share_like(self._encode_public(
                stype, np.ones(a.shape[:2], dtype=object))), array=True,
                integral=True)
            return u, a
        n0 = n % 2
        sel1 = (slice(None), slice(n0, None, 2))
        sel2 = (slice(None), slice(n0 + 1, None, 2))
        a1 = self.np_getitem(a, sel1)
        a2 = self.np_getitem(a, sel2)
        if key is None:
            c = self.np_less(a2, a1) if is_min else self.np_less(a1, a2)
        else:
            c = key(a2) < key(a1) if is_min else key(a1) < key(a2)
        cc = c if ks == 1 else self.np_expand_dims(c, -1)
        m = self.add(self.mul(cc, self.sub(a2, a1)), a1)
        if n0:
            m = self.np_concatenate(
                [self.np_getitem(a, (slice(None), slice(0, 1))), m], axis=1)
        u, m = self._np_argext(m, is_min, key, ks)
        if n0:
            u0 = self.np_getitem(u, (slice(None), slice(0, 1)))
            u = self.np_getitem(u, (slice(None), slice(1, None)))
        u2 = self.mul(u, c)
        inter = self.np_stack([self.sub(u, u2), u2], axis=-1)
        u = self.np_reshape(inter, (inter.shape[0], 2 * u2.shape[1]))
        if n0:
            u = self.np_concatenate([u0, u], axis=1)
        return u, m

    def unit_vector(self, a, n):
        """Secure length-n unit vector with 1 at secret index a, 0 <= a < n.

        Simple variant: via equality tests against each index (the
        reference's masked-rotation protocol runtime.py:4979-5029 is a
        later optimization).
        """
        stype = type(a)
        if stype.frac_length and not a.integral:
            raise ValueError('nonintegral fixed-point number')
        arr = self._wrap(stype, self._share_like(self._encode_public(
            stype, np.arange(n, dtype=object))), array=True, integral=True)
        diff = self.sub(self._as_array(stype, a, n), arr)
        e = self.np_equal(diff, self._wrap(
            stype, self._share_like(self._encode_public(
                stype, np.zeros(n, dtype=object))),
            array=True, integral=True))
        return self.np_tolist(e)

    def _as_array(self, stype, a, n):
        sh = self._share(a)
        lead = sh.shape[:self._pax]
        xp = np if isinstance(sh.data, np.ndarray) else jnp
        data = xp.broadcast_to(
            sh.data.reshape(lead + (1,) + sh.data.shape[len(lead):]),
            lead + (n,) + sh.data.shape[len(lead):])
        res = self._wrap(stype, sh.from_data(data), array=True,
                         integral=True)
        return res

    def find(self, x, a, bits=True, e='len(x)', f=None, cs_f=None):
        """Secure index ix of the first occurrence of a in list x.

        Full conditional-step-function contract of the reference
        (runtime.py:4486-4601): with bits=True (default) a and x hold 0/1
        values; bits=False allows arbitrary operands compared via ``!=``
        (so plain objects whose ``==`` lifts to a secure bit work too).

        If a does not occur, ix evaluates to e (an int, or an expression
        string over len(x)); e=None returns the raw pair (nf, f(ix)) with
        indicator nf=1 iff not found.  Function f maps the index to the
        returned value(s) without extra communication; its conditional-step
        form cs_f(b, i) == f(i+b) for b in {0,1} may be given instead.
        The search itself is a log-depth binary cascade of if_else merges.
        """
        if bits:
            if isinstance(a, int):
                if a == 1:
                    x = [1 - b for b in x]
            else:
                x = [a + (1 - 2*a) * b for b in x]
        else:
            x = [b != a for b in x]
        # locate the first 0 in x

        type_f = None
        if cs_f is None:
            if f is None:
                type_f = int
                f = lambda i: [i]
                cs_f = lambda b, i: [i + b]
            else:
                type_f = type(f(0))
                if issubclass(type_f, int):
                    f_int = f
                    f = lambda i: [f_int(i)]
                cs_f = lambda b, i: [b * (y1 - y0) + y0
                                     for y0, y1 in zip(f(i), f(i+1))]
        elif f is None:
            type_f = type(cs_f(0, 0))
            if issubclass(type_f, int):
                cs_int = cs_f
                cs_f = lambda b, i: [cs_int(b, i)]
            elif issubclass(type_f, tuple):
                cs_tup = cs_f
                cs_f = lambda b, i: list(cs_tup(b, i))
            f = lambda i: cs_f(0, i)
        else:
            type_f = type(f(0))
            if issubclass(type_f, int):
                f_int = f
                f = lambda i: [f_int(i)]

        if isinstance(e, str):
            e = eval(e)  # expression over len(x)  pylint: disable=eval-used

        if not x:
            nf = 1
            y = f(0) if e is None else f(e)
        else:
            def scan(i, j):
                # [nf, *value]: nf=1 iff no 0 in x[i:j]; value==f(first index)
                if j - i == 1:
                    b = x[i]
                    return [b] + cs_f(b, i)

                h = i + (j - i) // 2
                left = scan(i, h)
                return self.if_else(left[0], scan(h, j), left)

            nf, *f_ix = scan(0, len(x))
            if e is None:
                y = f_ix
            else:
                y = self.if_else(nf, [v if isinstance(v, sectypes.SecureObject)
                                      else type(nf)(v) for v in f(e)], f_ix)
        if issubclass(type_f, int):
            y = y[0]
        elif issubclass(type_f, tuple):
            y = tuple(y)
        return (nf, y) if e is None else y

    def np_find(self, a, s, axis=-1, bits=True, e='a.shape[axis]', f=None,
                cs_f=None):
        """Indices of first occurrences of s in a along the given axis.

        Log-depth np_where cascade, elementwise with broadcast (mirrors
        reference runtime.py:4603-4698; see find() for bits/e/f/cs_f).
        """
        if bits:
            if isinstance(s, int):
                if s == 1:
                    a = 1 - a
            elif isinstance(s, sectypes.SecureObject) or np.any(s):
                if hasattr(s, 'shape'):
                    s = self.np_expand_dims(s, axis) \
                        if isinstance(s, sectypes.SecureArray) \
                        else np.expand_dims(np.asarray(s, dtype=object), axis)
                a = s + (1 - 2 * s) * a
        else:
            a = a != s
        # now find the first 0 along the axis

        if cs_f is None:
            if f is None:
                type_f = int
                f = lambda i: np.stack((np.array(i, dtype=object),))
                cs_f = lambda b, i: (i + b,)
            else:
                type_f = type(f(0))
                if issubclass(type_f, int):
                    _f = f
                    f = lambda i: np.stack((np.array(_f(i), dtype=object),)) \
                        .reshape(-1, *((1,) * (len(a.shape) - 1)))
                cs_f = lambda b, i: tuple(b * (f_i1 - f_i) + f_i
                                          for f_i, f_i1 in zip(f(i), f(i+1)))
        else:
            if f is None:
                type_f = type(cs_f(0, 0))
                if issubclass(type_f, int):
                    _cs_f = cs_f
                    cs_f = lambda b, i: (_cs_f(b, i),)
                elif issubclass(type_f, list):
                    _cs_f = cs_f
                    cs_f = lambda b, i: tuple(_cs_f(b, i))
                f = lambda i: np.stack([np.array(v, dtype=object)
                                        for v in cs_f(0, i)]) \
                    .reshape(-1, *((1,) * (len(a.shape) - 1)))
            else:
                type_f = type(f(0))

        if isinstance(e, str):
            e = eval(e)  # pylint: disable=eval-used

        if not int(np.prod(a.shape, dtype=np.int64)):
            nf, c = 1, f(0) if e is None else None
            if e is not None:
                c = f(e)
        else:
            a = self.np_swapaxes(a, axis, -1)

            def enc_like(v, b):
                # lift public conditional-step entries alongside secure b
                if isinstance(v, sectypes.SecureObject):
                    return v
                st = type(b)
                return self._wrap(
                    st.sectype if hasattr(st, 'sectype') else st,
                    self._share_like(self._encode_public(
                        getattr(st, 'sectype', st),
                        np.broadcast_to(np.array(v, dtype=object),
                                        b.shape).copy())),
                    array=True, integral=True)

            def cl(i, j):
                n = j - i
                if n == 1:
                    b = self.np_getitem(a, (..., slice(i, i + 1)))
                    steps = tuple(enc_like(v, b) for v in cs_f(b, i))
                    return self.np_stack((b,) + steps)

                h = i + n // 2
                nf = cl(i, h)  # nf[0] <=> "0 is not found" in a[..., i:h]
                return self.np_where(self.np_getitem(nf, 0), cl(h, j), nf)

            c = cl(0, a.shape[-1])
            c = self.np_squeeze(c, -1)
            nf = self.np_getitem(c, 0)
            f_ix = self.np_getitem(c, slice(1, None))
            if e is None:
                c = f_ix
            else:
                c = self.np_where(nf, f(e), f_ix)

        if issubclass(type_f, int):
            c = self.np_getitem(c, 0) if isinstance(c, sectypes.SecureArray) \
                else c[0]
        elif issubclass(type_f, tuple):
            c = tuple(c)
        return (nf, c) if e is None else c

    def indexOf(self, x, a, bits=False):
        """Secure index of the first occurrence of a in x.

        Raises ValueError if a is not present (reference
        runtime.py:4700-4714; the public not-found test is by design).
        """
        if not x:
            raise ValueError('value is not in list')
        ix = self.find(x, a, e=-1, bits=bits)
        if self.eq_public(ix, -1):
            raise ValueError('value is not in list')
        return ix

    # ======================================================================
    # secure integer number theory: trailing zeros, gcd/lcm, extended gcd,
    # modular inverse via Bernstein-Yang divsteps, integer divmod and
    # bit length (reference: runtime.py:1883-2022, secgroups.py:692-760)
    # ======================================================================

    def trailing_zeros(self, a, l=None):
        """Secure l least significant bits of a, correct up to and
        including the least significant 1 (reference runtime.py:1883)."""
        secint = type(a)
        if l is None:
            l = secint.bit_length
        x = self.to_bits(a, l)
        return x

    def gcp2(self, a, b, l=None):
        """Secure greatest common power of 2 dividing a and b."""
        x = self.trailing_zeros(a, l=l)
        y = self.trailing_zeros(b, l=l)
        z = self.vector_sub(self.vector_add(x, y), self.schur_prod(x, y))
        # 2**"index of first 1 in z"; e=None keeps going one step past the
        # end when z is all-zero (gcd(0,0) case), like the reference
        # runtime.py:1908-1915
        _, f_i = self.find(z, 1, e=None, cs_f=lambda b, i: (b+1) << i)
        return f_i

    @staticmethod
    def _divstep_iterations(l):
        """Iteration bound for Bernstein-Yang divsteps on l-bit inputs
        (Theorem 11.2, eprint 2019/266)."""
        return (49*l + (80 if l < 46 else 57)) // 17

    def _gcd(self, a, b, l=None):
        secint = type(a)
        if l is None:
            l = secint.bit_length

        pow_of_2 = self.gcp2(a, b, l=l)
        a, b = self.scalar_mul(1/pow_of_2, [a, b])

        g, f = self.if_swap(self.mod(a, 2), a, b)
        # f odd now (or f=g=0); stripped divsteps without Bezout tracking
        delta = secint(1)
        for i in range(self._divstep_iterations(l)):
            delta_gt0 = 1 - self.sgn((delta - 1 - (i % 2)) / 2,
                                     l=max(min(i, l).bit_length(), 1), LT=True)
            g_0 = self.mod(g, 2)
            delta, f, g = self.if_else(delta_gt0 * g_0,
                                       [-delta, g, -f], [delta, f, g])
            delta, g = delta + 1, (g + g_0 * f) / 2
        return pow_of_2 * f

    def gcd(self, a, b, l=None):
        """Secure gcd of a and b; l bounds both bit lengths if given."""
        return self.abs(self._gcd(a, b, l=l), l=l)

    def lcm(self, a, b, l=None):
        """Secure lcm of a and b; l bounds both bit lengths if given."""
        g = self._gcd(a, b, l=l)
        return self.abs(a * (b / (g + self.eq(g, 0))), l=None)

    def _divsteps(self, a, b, l=None):
        """Secure f, v with f = gcd(a, b) = u*a + v*b (a odd, or a=b=0).

        Bernstein-Yang constant-iteration divsteps (eprint 2019/266),
        avoiding 2-adic arithmetic: g and the Bezout row r are kept even
        by conditional additions before the exact halving.
        """
        secint = type(a)
        if l is None:
            l = secint.bit_length
        delta, f, v, g, r = secint(1), a, secint(0), b, secint(1)
        for i in range(self._divstep_iterations(l)):
            delta_gt0 = 1 - self.sgn((delta - 1 - (i % 2)) / 2,
                                     l=max(min(i, l).bit_length(), 1), LT=True)
            g_0 = self.mod(g, 2)
            delta, f, v, g, r = self.if_else(delta_gt0 * g_0,
                                             [-delta, g, r, -f, -v],
                                             [delta, f, v, g, r])
            g, r = self.if_else(g_0, [g + f, r + v], [g, r])
            r = self.if_else(self.mod(r, 2), r + a, r)
            delta, g, r = delta + 1, g / 2, r / 2
        return f, v

    def inverse(self, a, b, l=None):
        """Secure inverse of a modulo b, for a>=0, b>0, gcd(a,b)=1."""
        c = 1 - self.mod(a, 2)
        a, b_ = self.if_swap(c, a, b)
        g, t = self._divsteps(a, b_, l=l)  # g in {1, -1}
        t = g * (t - a)
        s = (1 - t * b_) / a
        u = self.if_else(c, t, s)
        u = self.if_else(self.sgn(u, LT=True), u + 2*b, u)
        u = self.if_else(1 - self.lt(u, b), u - b, u)
        return u

    def gcdext(self, a, b, l=None):
        """Secure extended gcd: (g, s, t) with g = gcd(a,b) = s*a + t*b."""
        pow_of_2 = self.gcp2(a, b, l=l)
        a, b = self.scalar_mul(1/pow_of_2, [a, b])
        c = 1 - self.mod(a, 2)
        a, b = self.if_swap(c, a, b)  # now a odd (or a=0=b)
        g, t = self._divsteps(a, b, l=l)
        g0 = self.mod(g, 2)  # 1 iff g != 0
        sgn_g = g0 - 2*self.sgn(g, l=l, LT=True)
        g, t = self.scalar_mul(sgn_g, [g, t])  # force g >= 0
        s = (g - t * b) / (a + 1 - g0)  # guard division when a=0 (so b=0)
        s, t = self.if_swap(c, s, t)
        return pow_of_2 * g, s, t

    def _divmod(self, a, b):
        """Secure integer divmod(a, b) for b > 0, via fixed-point
        reciprocal with a one-step correction (reference secgroups.py:692)."""
        secint = type(a)
        secfxp = self.SecFxp(2*secint.bit_length + 2)
        a1, b1 = self.convert([a, b], secfxp)
        q = self.convert(a1 / b1, secint)
        r = a - b * q
        q, r = self.if_else(self.sgn(r, LT=True), [q - 1, r + b], [q, r])
        q, r = self.if_else(1 - self.lt(r, b), [q + 1, r - b], [q, r])
        return q, r

    def _bit_length(self, a):
        """Secure pair (len, 2**len) for the bit length of a >= 0."""
        secint = type(a)
        l = secint.bit_length
        x = self.to_bits(a, l)
        x.reverse()  # MSB first; count leading zeros z, len = l - z
        inv2 = secint.field(1) / secint.field(2)
        z, p2z = self.find(
            x, 1, e='len(x)',
            cs_f=lambda b, i: (i + b, (2 - b) * secint(int(inv2**(i+1)))))
        return l - z, p2z * (1 << l)

    # ======================================================================
    # fixed-point layer: normalization + Newton reciprocal
    # (reference: runtime.py:4718-4745)
    # ======================================================================

    def _dot_public_last(self, u, weights):
        """sum_i u[..., i] * w_i along the last logical axis (public w;
        one local mul + sum instead of a Python dispatch loop per term)."""
        field = u.field
        if isinstance(field.modulus, int):
            weights = [v % field.modulus for v in weights]
        w = field.array(np.array(weights, dtype=object))
        return (u * w).sum(axis=len(u.shape) - 1)

    def _dot_pow2_last(self, u):
        """sum_i u[..., i] * 2^i along the last logical axis."""
        n = u.shape[-1]
        return self._dot_public_last(u, [1 << i for i in range(n)])

    def _prefix_mul_raw(self, s):
        """Inclusive prefix products along the last logical axis (raw field
        arrays of 0/1 values; log2(n) resharing rounds, Hillis-Steele)."""
        n = s.shape[-1]
        d = 1
        ones_block = s.field.array(np.ones(1, dtype=object))
        while d < n:
            shifted = s.roll(d, axis=-1)
            shifted = shifted.at_set((..., slice(0, d)), ones_block)
            s = self._reshare(s * shifted)
            d *= 2
        return s

    def _norm(self, a):
        """Secure signed normalization factor v with a*v in [1/2, 1).

        Raw-field variant of the reference _norm (runtime.py:4718-4727):
        bit-decompose, locate the most significant bit agreeing with the
        sign via a log-depth prefix product, and scale. The conditional-step
        find of the reference becomes P_{i-1} - P_i position indicators.
        """
        stype = self._sectype(a)
        f = stype.frac_length
        l = stype.bit_length
        is_arr = isinstance(a, sectypes.SecureArray)
        bits = self.np_to_bits(a, l)
        rb = self._share(bits)
        if f:
            rb = rb >> f                                # raw 0/1 field bits
        sign = rb[..., l - 1]
        one = stype.field.array(np.ones(1, dtype=object))  # for at_set blocks
        s_raw = 1 - sign                                # 1 iff a >= 0
        x = rb[..., :l - 1]
        x = x.from_data(
            finfields._xp(x.data).flip(x.data, axis=len(x.shape) - 1))  # MSB first
        # mismatch q_i = x_i XOR s  (one mul round)
        s_col = self._logical_reshape(s_raw, s_raw.shape[self._pax:] + (1,))
        xs = self._reshare(x * s_col)
        q = x + s_col - xs * 2
        P = self._prefix_mul_raw(q)                     # 1 until first match
        prev = P.roll(1, axis=-1)
        prev = prev.at_set((..., slice(0, 1)), one)
        u = prev - P                                    # first-match one-hot
        nf = self._dot_pow2_last(u)                     # sum_i u_i 2^i
        v_raw = self._reshare((s_raw * 2 - 1) * nf)   # signed power of two
        # fxp share scale: v_real = (2s-1) nf 2^(f-(l-1));
        # share(v) = v_real 2^f = v_raw 2^(2f-l+1)
        shift = 2 * f - l + 1
        sv = (v_raw << shift) if shift >= 0 else (v_raw >> (-shift))
        return self._wrap(stype, sv, array=is_arr, integral=False)

    def _rec(self, a):
        """Secure fixed-point reciprocal via Newton iteration
        (reference: runtime.py:4729-4737)."""
        f = self._sectype(a).frac_length
        v = self._norm(a)
        b = self.mul(a, v)         # 1/2 <= b <= 1
        theta = int(math.ceil(math.log2((f + 1) / 3.54)))
        c = self.sub(self._public_fxp(a, 2.9142135623731), self.mul(b, 2))
        for _ in range(theta):
            c = self.mul(c, self.sub(self._public_fxp(a, 2), self.mul(c, b)))
        return self.mul(c, v)

    def _norm2(self, a, signed=True):
        """Like _norm but also returns k (secure) with a = b * 2^k,
        b in [1/2, 1): k = (l-1) - match_position - f.

        With signed=False the factor v is the plain power of two (no sign
        flip), so a*v keeps a's sign with |a*v| in [1/2, 1) — what the
        SecureFloat addition needs (reference sectypes.py:84-92)."""
        stype = self._sectype(a)
        f = stype.frac_length
        l = stype.bit_length
        is_arr = isinstance(a, sectypes.SecureArray)
        bits = self.np_to_bits(a, l)
        rb = self._share(bits)
        if f:
            rb = rb >> f
        one = stype.field.array(np.ones(1, dtype=object))
        sign = rb[..., l - 1]
        s_raw = 1 - sign
        x = rb[..., :l - 1]
        x = x.from_data(
            finfields._xp(x.data).flip(x.data, axis=len(x.shape) - 1))
        s_col = self._logical_reshape(s_raw, s_raw.shape[self._pax:] + (1,))
        xs = self._reshare(x * s_col)
        q = x + s_col - xs * 2
        P = self._prefix_mul_raw(q)
        prev = P.roll(1, axis=-1)
        prev = prev.at_set((..., slice(0, 1)), one)
        u = prev - P
        nf = self._dot_pow2_last(u)
        k_raw = self._dot_public_last(
            u, [(l - 1 - i) - f for i in range(l - 1)])
        v_raw = self._reshare((s_raw * 2 - 1) * nf) if signed else nf
        shift = 2 * f - l + 1
        sv = (v_raw << shift) if shift >= 0 else (v_raw >> (-shift))
        v = self._wrap(stype, sv, array=is_arr, integral=False)
        k = self._wrap(stype, k_raw << f if f else k_raw, array=is_arr,
                       integral=True)
        return v, k

    @staticmethod
    @functools.cache
    def _taylor_log_degree(f):
        """Taylor degree for f-bit-accurate log around 1/sqrt(2)
        (reference runtime.py:4853-4863)."""
        w = 1 / (math.sqrt(2) - 1)
        k = f - 1
        while k > 1 and math.log2(k) + k * math.log2(w) >= f:
            k -= 1
        return k

    def np_log(self, a):
        """Secure natural log of positive fixed-point a.

        Normalize to b in [1/2, 1) and evaluate a Taylor polynomial
        around 1/sqrt(2) of degree adapted to the fractional precision
        (reference runtime.py:4866-4891)."""
        stype = self._sectype(a)
        f = stype.frac_length
        v, k = self._norm2(a, signed=False)  # a = b * 2^k, b = a*v in [.5,1)
        b = self.mul(a, v)
        alpha = 0.5 * math.sqrt(2)
        y = self.sub(b, alpha)               # |y| < 1 - sqrt(2)/2
        theta = self._taylor_log_degree(f)
        # ln(b) = ln(alpha) - sum_{i=1..theta} y^i / (i (-alpha)^i), Horner
        coeffs = [-1.0 / (i * (-alpha) ** i) for i in range(1, theta + 1)]
        acc = self._public_fxp(a, coeffs[-1])
        for c in reversed(coeffs[:-1]):
            acc = self.add(self.mul(acc, y), self._public_fxp(a, c))
        res = self.add(self.mul(acc, y), self._public_fxp(a, math.log(alpha)))
        return self.add(res, self.mul(k, math.log(2)))

    def np_log2(self, a):
        """Secure log2 of positive fixed-point a."""
        return self.mul(self.np_log(a), 1 / math.log(2))

    def np_log10(self, a):
        return self.mul(self.np_log(a), 1 / math.log(10))

    def log(self, a, base=None):
        r = self.np_log(a) if base is None else \
            self.mul(self.np_log(a), 1.0 / math.log(base))
        return r

    @staticmethod
    @functools.cache
    def _taylor_exp2_degree(f):
        """Taylor degree for f-bit-accurate 2^x on [0,1)
        (reference runtime.py:4901-4910)."""
        log2ln2 = math.log2(math.log(2))
        k = 1
        log2factorial = 1  # log2 (k+1)!
        while log2factorial - (k + 1) * log2ln2 < f + 1:
            k += 1
            log2factorial += math.log2(k + 1)
        return k

    def np_exp2(self, a):
        """Secure 2**a for fixed-point a.

        Integer/fraction split: the integer part exponentiates exactly in
        the field (offset to nonnegative, divided back out by a public
        field power); the fractional part uses an f-bit-accurate Taylor
        series of exp (reference runtime.py:4912-4941)."""
        stype = self._sectype(a)
        f = stype.frac_length
        l = stype.bit_length
        max_a_bl = f + (l - 1 - f).bit_length() + 1  # 2^a <= 2^(l-1-f)
        # integer part: trunc removes f bits; rescale to the fxp domain
        fl_t = self.trunc(a, f=f, l=max_a_bl)
        a_int = self.mul(fl_t, 1 << f)
        if hasattr(a_int, 'integral'):
            a_int.integral = True
        frac = self.sub(a, a_int)
        # Taylor of exp at y = frac*ln2 in [0, ln2): degree for f bits
        theta = self._taylor_exp2_degree(f)
        y = self.mul(frac, math.log(2))
        coeffs = [1.0 / math.factorial(i) for i in range(theta + 1)]
        acc = self._public_fxp(a, coeffs[-1])
        for c in reversed(coeffs[:-1]):
            acc = self.add(self.mul(acc, y), self._public_fxp(a, c))
        # 2^a_int exactly: offset to nonnegative, field-exact power,
        # divide the offset back out as a public field power
        offset = 1 << (l - 1 - f)
        a_off = self.add(a_int, offset)
        pw = self.np_pow(2, a_off)
        res = self.mul(acc, pw)
        return self.div(res, stype.field(2) ** offset)

    def _bit_sel(self, bits, j):
        stype = self._sectype(bits)
        piece = self._share(bits)[..., j]
        return self._wrap(stype, piece, array=bool(piece.shape[self._pax:]),
                          integral=True)

    def np_exp(self, a):
        """Secure e**a for fixed-point a."""
        return self.np_exp2(self.mul(a, 1.4426950408889634))

    def exp(self, a):
        return self.np_exp(a)

    def _cpx_mul(self, x, y):
        """Secure complex product of 2-tuples x, y with one resharing
        (reference runtime.py:4747-4792). Components are secure fxp
        values/arrays or public floats/float arrays."""
        shx = isinstance(x[0], sectypes.SecureObject)
        shy = isinstance(y[0], sectypes.SecureObject)
        stype = self._sectype(x[0]) if shx else self._sectype(y[0])
        f = stype.frac_length

        def enc_pair(pair):
            out, integral = [], True
            for v in pair:
                if isinstance(v, sectypes.SecureObject):
                    out.append(self._share(v))
                    integral = integral and self._integral(v)
                else:
                    vals = np.asarray(v).reshape(-1)
                    if any(isinstance(u, (float, np.floating))
                           and not float(u).is_integer() for u in vals):
                        integral = False
                    out.append(self._encode_public(stype, v))
            return out, integral

        (a, b), x_int = enc_pair(x)
        (c, d), y_int = enc_pair(y)
        z0 = a * c - b * d
        z1 = a * d + b * c
        if f and (x_int or y_int):
            z0 = z0 >> f  # exact: one operand integral
            z1 = z1 >> f
        if shx and shy:
            z0, z1 = self._reshare([z0, z1])
        if f and not (x_int or y_int):
            z0 = self.np_trunc_field(z0, f, stype.bit_length, stype)
            z1 = self.np_trunc_field(z1, f, stype.bit_length, stype)
        arr = bool(z0.shape[self._pax:])
        integral = x_int and y_int
        return (self._wrap(stype, z0, array=arr, integral=integral),
                self._wrap(stype, z1, array=arr, integral=integral))

    def sincos(self, a):
        """Secure (sin a, cos a) for fixed-point a, any range.

        Korzilius-Schoenmakers CSCML'23 protocol (reference
        runtime.py:4794-4838): blind the angle with a random grid point psi
        whose rotation (cos, -sin) is built from random bits via complex
        products, open the masked angle, rotate back publicly.
        """
        stype = self._sectype(a)
        shape = a.shape if isinstance(a, sectypes.SecureArray) else ()
        N = int(np.prod(shape, dtype=np.int64)) if shape else 1
        f = stype.frac_length
        k = f + 6
        secfxp2 = self.SecFxp(2 * k)  # frac length k
        n = 1 << k

        bits = self.np_random_bits(secfxp2, N * k)
        bits = self.np_reshape(bits, (N, k))
        # psi = sum_j bits[:, j] * 2^(k-1-j) as an integral fxp array
        weights = np.array([1 << (k - 1 - j) for j in range(k)], dtype=object)
        psi = self.np_sum(self.mul(bits, weights), axis=1)

        b = [self._bit_sel(bits, j) for j in range(k)]
        r12 = self.mul(b[1], b[2])
        s0 = self.sub(1, self.mul(b[0], 2))
        isq2 = 1 / math.sqrt(2)
        c0 = self.mul(s0, self.add(
            self.sub(self.add(self.sub(1, b[1]), self.sub(r12, b[2])), 0),
            self.mul(self.sub(b[2], self.mul(r12, 2)), isq2)))
        s_0 = self.mul(s0, self.add(self.sub(b[1], r12), self.mul(b[2], isq2)))
        cs_psi = [(c0, self.neg(s_0))]
        for i in range(3, k):
            theta_i = math.pi / (1 << i)
            c_i = self.add(1, self.mul(b[i], math.cos(theta_i) - 1))
            s_i = self.mul(b[i], -math.sin(theta_i))
            cs_psi.append((c_i, s_i))
        while len(cs_psi) > 1:  # log-depth product of rotations
            nxt = [self._cpx_mul(cs_psi[i], cs_psi[i + 1])
                   for i in range(0, len(cs_psi) - 1, 2)]
            if len(cs_psi) % 2:
                nxt.append(cs_psi[-1])
            cs_psi = nxt
        cs_psi = cs_psi[0]

        R = self._np_randoms(secfxp2, N, 1 << self.options.sec_param)
        R = self.np_left_shift(R, k)

        a_list = self.np_tolist(a) if shape else [a]
        a2 = self.convert(a_list, secfxp2)
        a2 = self.np_fromlist(a2)
        a2 = self.mul(self.div(a2, 2 * math.pi), n)
        a2 = self.np_left_shift(self.np_trunc(a2), k)
        chi = self.output(self.add(a2, self.add(psi, self.mul(R, n))),
                          raw=True)
        chi_vals = np.array([(int(v) >> k) % n
                             for v in np.atleast_1d(chi.value.reshape(-1))],
                            dtype=object)
        angles = chi_vals.astype(np.float64) * (2 * math.pi / n)
        c, s = self._cpx_mul(cs_psi, (np.cos(angles), np.sin(angles)))
        out = self.convert(self.np_tolist(c) + self.np_tolist(s), stype)
        c_out, s_out = out[:N], out[N:]
        if shape:
            s_res = self.np_reshape(self.np_fromlist(s_out), shape)
            c_res = self.np_reshape(self.np_fromlist(c_out), shape)
            return s_res, c_res
        return s_out[0], c_out[0]

    def sin(self, a):
        """Secure sine of fixed-point a."""
        return self.sincos(a)[0]

    def cos(self, a):
        """Secure cosine of fixed-point a."""
        return self.sincos(a)[1]

    def tan(self, a):
        """Secure tangent of a."""
        s, c = self.sincos(a)
        return self.div(s, c)

    def _public_fxp(self, like, value):
        """Public constant as a secure object of like's type."""
        stype = self._sectype(like)
        enc = self._encode_public(stype, value)
        return self._wrap(stype, enc, array=False,
                          integral=float(value).is_integer())


def _field_det_public(field, arr):
    """Determinant mod p of an opened field array (host Gaussian elim)."""
    p = field.modulus
    a = [[int(v) % p for v in row] for row in arr.value.tolist()]
    n = len(a)
    det = 1
    for i in range(n):
        piv = next((r for r in range(i, n) if a[r][i] % p), None)
        if piv is None:
            return field(0)

        if piv != i:
            a[i], a[piv] = a[piv], a[i]
            det = -det
        det = det * a[i][i] % p
        inv = pow(a[i][i], -1, p)
        for r in range(i + 1, n):
            f = a[r][i] * inv % p
            if f:
                for c in range(i, n):
                    a[r][c] = (a[r][c] - f * a[i][c]) % p
    return field(det % p)


def _concat_field(field, arrays):
    """Concatenate 1-D field arrays (numpy-aware: host data stays host)."""
    from mpyc_tpu.utils.lazyjax import jnp
    datas = finfields._unify_host_reps([a.data for a in arrays])
    xp = np if all(isinstance(d, np.ndarray) for d in datas) else jnp
    return field.array.from_data(xp.concatenate(datas, axis=0))


def _concat_axis(field, arrays, axis):
    """Concatenate field arrays along a logical axis (negative = from end)."""
    from mpyc_tpu.utils.lazyjax import jnp
    datas = finfields._unify_host_reps([a.data for a in arrays])
    nd_elem = field.array._elem_ndim
    ax = axis if axis >= 0 else axis - nd_elem
    xp = np if all(isinstance(d, np.ndarray) for d in datas) else jnp
    return field.array.from_data(xp.concatenate(datas, axis=ax))


# ===========================================================================
# setup
# ===========================================================================

def generate_configs(m, addresses):
    """Generate INI config per party (reference: runtime.py:5061-5082)."""
    import configparser
    configs = [configparser.ConfigParser() for _ in range(m)]
    for i, (host, port) in enumerate(addresses):
        for config in configs:
            config.add_section(f'Party {i}')
            config.set(f'Party {i}', 'host', host)
            config.set(f'Party {i}', 'port', str(port))
    return configs


def setup(argv=None):
    """Parse CLI args / environment and return the runtime."""
    import argparse
    parser = argparse.ArgumentParser(add_help=False)
    group = parser.add_argument_group('MPyC-TPU help')
    group.add_argument('-V', '--VERSION', action='store_true',
                       help='print MPyC-TPU version number and exit')
    group.add_argument('-H', '--HELP', action='store_true',
                       help='print this help message for MPyC-TPU and exit')
    group = parser.add_argument_group('MPyC-TPU configuration')
    group.add_argument('-C', '--config', metavar='ini',
                       help='use ini file, defining all m parties')
    group.add_argument('-P', dest='parties', action='append', metavar='addr',
                       help='use addr=host:port per party (repeat m times)')
    group.add_argument('-M', type=int, dest='M', metavar='m',
                       help='use m local parties (and run all m, '
                            'if i is not set)')
    group.add_argument('-I', '--index', type=int, metavar='i',
                       help='set index of this local party to i, 0<=i<m')
    group.add_argument('-T', '--threshold', type=int, metavar='t',
                       help='threshold t, 0<=t<m/2')
    group.add_argument('-B', '--base-port', type=int, default=11365,
                       metavar='b', help='use port number b+i for party i')
    group.add_argument('--ssl', action='store_true',
                       help='enable SSL connections')
    group.add_argument('--sim', action='store_true',
                       help='co-located simulator plane: all m parties in '
                            'this process, party axis on the device mesh')
    group.add_argument('-W', '--workers', type=int, metavar='w',
                       help='maximum number of worker threads per party')
    group = parser.add_argument_group('MPyC-TPU parameters')
    group.add_argument('-L', '--bit-length', type=int, default=32,
                       metavar='l',
                       help='default bit length l for secure numbers')
    group.add_argument('-K', '--sec-param', type=int, default=30, metavar='k',
                       help='security parameter k, leakage probability 2**-k')
    group.add_argument('--no-prss', action='store_true',
                       help='use interactive protocols instead of PRSS')
    group.add_argument('--no-async', action='store_true',
                       help='no-op (evaluation is round-eager already)')
    group.add_argument('--no-barrier', action='store_true',
                       help='disable barriers')
    group.add_argument('--no-gmpy2', action='store_true',
                       help='accepted for compatibility (no-op on TPU build)')
    group.add_argument('--no-numpy', action='store_true',
                       help='accepted for compatibility (no-op on TPU build)')
    group.add_argument('--no-uvloop', action='store_true',
                       help='accepted for compatibility (no-op on TPU build)')
    group.add_argument('--mix32-64bit', action='store_true',
                       help='portable wire marshaling for mixed platforms')
    group = parser.add_argument_group('MPyC-TPU misc')
    group.add_argument('--output-windows', action='store_true',
                       help='accepted for compatibility (no-op, headless)')
    group.add_argument('--output-file', action='store_true',
                       help='append output of parties 1<=i<m to party{m}_{i}.log')
    group.add_argument('--log-level', default='warning', metavar='ll',
                       help='logging level ll=debug/info/warning(default)/error')
    group.add_argument('--no-log', action='store_true',
                       help='disable logging messages')
    group.add_argument('-f', type=str, default='',
                       help='consume IPython\'s -f argument F')
    raw_argv = list(sys.argv)  # keep raw args for respawning peers
    args, leftover = parser.parse_known_args(argv)
    if argv is None:
        # strip runtime options so applications only see their own args
        # (reference runtime.py:5102: sys.argv = [sys.argv[0]] + args)
        sys.argv = [sys.argv[0]] + leftover
    if args.VERSION:
        from mpyc_tpu import __version__
        print(f'mpyc_tpu {__version__}')
        sys.exit()
    if args.HELP:
        parser.print_help()
        sys.exit()

    logging.basicConfig(level=logging.WARNING if args.no_log else
                        getattr(logging, args.log_level.upper(),
                                logging.WARNING))

    options = _Options(bit_length=args.bit_length, sec_param=args.sec_param,
                       threshold=args.threshold, no_prss=args.no_prss,
                       base_port=args.base_port, ssl=args.ssl, sim=args.sim)

    m = args.M or 1
    if args.parties:
        addrs = []
        for spec in args.parties:
            host, _, port = spec.rpartition(':')
            addrs.append((host or 'localhost', int(port)))
        m = len(addrs)
        parties = [Party(i, h, p) for i, (h, p) in enumerate(addrs)]
        pid = args.index
    elif m > 1 and not options.sim:
        parties = [Party(i, 'localhost', args.base_port + i) for i in range(m)]
        pid = args.index
        if pid is None:
            # spawn the other m-1 parties (reference: runtime.py:5156-5193).
            # Default is os.fork(): the children inherit the parent's
            # fully-imported interpreter (jax import costs seconds; paying
            # it once instead of m times cuts multi-party wall-clock by
            # ~2-3 s per run). Safe here: no event loop, transport, XLA
            # client, or session RNG exists yet — the Runtime (and its
            # private KeccakRNG key, drawn from the kernel CSPRNG) is
            # constructed after this block in every process.
            # MPYC_TPU_SPAWN=subprocess restores fresh-interpreter spawns.
            pid = 0
            if options.ssl:
                # single-machine -M run: auto-generate missing certs so
                # the spawned parties find them (.config/ in the cwd)
                from mpyc_tpu.utils import certs as _certs
                _certs.generate(m)
            use_fork = (hasattr(os, 'fork')
                        and os.getenv('MPYC_TPU_SPAWN', 'fork') == 'fork')
            if use_fork:
                sys.stdout.flush()
                sys.stderr.flush()
                _child_pids = []
                for i in range(1, m):
                    cpid = os.fork()
                    if cpid == 0:
                        pid = i
                        _child_pids = []
                        # drop any pre-fork cached module-level randomness
                        from mpyc_tpu import thresha as _th
                        _th._default_rng.cache_clear()
                        if args.output_windows:
                            pass  # keep attached to the parent terminal
                        elif args.output_file:
                            fh = open(f'party{m}_{i}.log', 'a', buffering=1)
                            fh.write('\n')
                            os.dup2(fh.fileno(), 1)
                            os.dup2(fh.fileno(), 2)
                        else:
                            devnull = os.open(os.devnull, os.O_WRONLY)
                            os.dup2(devnull, 1)
                        break
                    _child_pids.append(cpid)
                if pid == 0 and _child_pids:
                    import atexit

                    def _reap(pids=_child_pids):
                        for c in pids:
                            try:
                                os.waitpid(c, 0)
                            except (ChildProcessError, OSError):
                                pass
                    atexit.register(_reap)
            else:
                import subprocess
                prog = raw_argv[0]
                for i in range(1, m):
                    cmd = [sys.executable, prog] + raw_argv[1:] + \
                        ['-I', str(i)]
                    if args.output_windows:  # compat: keep attached
                        subprocess.Popen(cmd)
                    elif args.output_file:
                        # reference runtime.py:5183-5187: party{m}_{i}.log
                        with open(f'party{m}_{i}.log', 'a') as fh:
                            fh.write('\n')
                            fh.write(f'$> {" ".join(cmd)}\n')
                            subprocess.Popen(cmd, stdout=fh,
                                             stderr=subprocess.STDOUT)
                    else:
                        subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                                        stderr=subprocess.STDOUT)
    else:
        parties = [Party(i) for i in range(m)]
        pid = args.index if args.index is not None else 0

    if os.getenv('MPYC_TPU_PARTY_DEVICE') is None and \
            not (options.sim and m > 1) and \
            (m > 1 or os.getenv('PALLAS_AXON_POOL_IPS')):
        # Default the eager protocol runtime to CPU when (a) local
        # multi-process parties would contend for one TPU chip, or (b) the
        # TPU is only reachable through the axon tunnel, where per-op
        # dispatch is a network round trip that dwarfs eager scalar work.
        # The co-located simulator plane (--sim) is exempt: it is the
        # batched TPU plane, where whole protocol rounds compile into one
        # program (models/pipelines.py make_reshare_step) and the tunnel
        # round trip amortizes over the batch. Set MPYC_TPU_PARTY_DEVICE=tpu
        # to override here. When jax has not even been imported yet (the
        # host-only scalar plane is jax-free, utils/lazyjax.py), pin the
        # platform via the environment instead of forcing the import.
        if 'jax' in sys.modules:
            import jax
            try:
                jax.config.update('jax_platforms', 'cpu')
            except Exception:
                pass
        else:
            os.environ['JAX_PLATFORMS'] = 'cpu'
    elif os.getenv('MPYC_TPU_PARTY_DEVICE') == 'tpu':
        import mpyc_tpu
        mpyc_tpu.enable_compile_cache(probe_backend=False)

    if options.sim and m > 1:
        from mpyc_tpu.parallel.simulator import SimRuntime
        rt = SimRuntime(m, options)
    else:
        rt = Runtime(pid, parties, options)
    rt._wire_modules()
    return rt


mpc = setup()
