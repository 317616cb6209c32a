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
import itertools
import logging
import math
import os
import secrets
import sys
import time
from dataclasses import dataclass

import numpy as np

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
        self.no_prss = kw.get('no_prss', False)
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
    gather = None  # set below
    coroutine = staticmethod(lambda f: f)
    returnType = None

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

    # -- lifecycle ---------------------------------------------------------

    @property
    def threshold(self):
        """Threshold for MPC."""
        return self._threshold

    @threshold.setter
    def threshold(self, t):
        self._threshold = t
        if self.options.no_prss:
            return
        m = len(self.parties)
        self.prfs.cache_clear()
        keys = {}
        for subset in itertools.combinations(range(m), m - t):
            if subset[0] == self.pid:
                keys[subset] = secrets.token_bytes(16)
        self._prss_keys = keys

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
        """Start the runtime: connect to all other parties."""
        self.start_time = time.time()
        m = len(self.parties)
        if m == 1:
            return
        from mpyc_tpu.parallel.exchange import TcpExchange
        self.exchange = TcpExchange(self)
        self.exchange.start()

    def shutdown(self):
        """Shut down the runtime: close connections, log statistics."""
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

    def throttler(self, load_percentage=1.0, name=None):
        """No-op in eager mode (kept for API compatibility)."""

    def logging(self, enable=None):
        if enable is None:
            enable = logger.getEffectiveLevel() > logging.INFO
        logger.setLevel(logging.INFO if enable else logging.WARNING)

    # -- messaging helpers -------------------------------------------------

    def _send(self, peer, pc, data: bytes):
        self.exchange.send(peer, pc, data)

    def _recv(self, peer, pc) -> bytes:
        return self.exchange.receive(peer, pc)

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
        t = self.threshold if threshold is None else threshold
        m = len(self.parties)
        if receivers is None:
            receivers = range(m)
        receivers = [receivers] if isinstance(receivers, int) else list(receivers)

        stype = type(xl[0])
        if issubclass(stype, sectypes.SecureObject):
            if hasattr(stype, '_output') and callable(getattr(stype, '_output', None)) \
                    and not isinstance(xl[0], (sectypes.SecureNumber, sectypes.SecureArray)):
                pass  # custom secure objects: handled by their _output hook
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
                    if is_arr:
                        ys = [conv(a) for a in ys]
                    else:
                        ys = [conv(a) for a in ys]
        else:
            ys = [None] * len(shares)
        return ys if x_is_list else ys[0]

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
        pts = []
        for j in range(2 * t + 1):
            peer = (uci + j) % m
            if peer == self.pid:
                if own_rows is not None:
                    pts.append((peer + 1, own_rows))
            else:
                data = self._recv(peer, pc)
                pts.append((peer + 1, self._split_rows(field, data, sizes)))
        ys = []
        for i, xi in enumerate(xl):
            points = [(xc, rows[i]) for xc, rows in pts]
            rec = thresha.np_recombine(field, points)
            ys.append(rec.reshape(xi.shape) if xi.shape else rec.reshape(()))
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

    def _convert(self, x, t_type):
        s_type = type(x[0])
        if issubclass(s_type, sectypes.SecureArray):
            raise NotImplementedError('convert of arrays: use np ops')
        n = len(x)
        m = len(self.parties)
        t = self.threshold
        s_field = s_type.field
        t_field = t_type.field
        s_is_ff = issubclass(s_type, sectypes.SecureFiniteField)
        if s_is_ff:
            bound = s_field.order
            l = None
        else:
            k = self.options.sec_param
            l = min(s_type.bit_length, t_type.bit_length)
            # power-of-2 bound (reference uses exact bound; a power of two
            # embeds the identical integers into both fields on device)
            bound = 1 << max(0, (k + l) - math.comb(m, t).bit_length() + 1)

        prfs_s = self.prfs(bound)
        uci = self._prss_uci()
        # same uci (hence the same PRF integers) in both fields
        # (reference: runtime.py:758-761)
        s_r = thresha.np_pseudorandom_share(s_field, m, self.pid, prfs_s, uci, n)
        t_r = thresha.np_pseudorandom_share(t_field, m, self.pid, prfs_s, uci, n)

        d = t_type.frac_length - s_type.frac_length
        shares = [xi.share.reshape(1) if not xi.share.shape else xi.share
                  for xi in x]
        stacked = _concat_field(s_field, shares)
        if d < 0:
            stacked = self.np_trunc_field(stacked, -d, s_type.bit_length,
                                          s_type)
        if s_field.is_signed:
            offset = s_field.order // 2 if s_is_ff else 1 << (l - 1)
        else:
            offset = 0
        masked = stacked + offset + s_r
        c = self.output(masked)  # public field array in s_field
        c_ints = [int(v) for v in c.value.reshape(-1)]
        out = []
        t_r_vals = t_r
        for i in range(n):
            v = t_field.array(np.array(c_ints[i], dtype=object)) - \
                t_r_vals[i]
            if s_is_ff:
                v = self._mod_public_field(t_type, v, s_field.modulus)
            v = v - offset
            if d > 0 and not s_is_ff:
                v = v * (1 << d)
            res = t_type(v.reshape(()))
            if issubclass(t_type, sectypes.SecureFixedPoint):
                res.integral = not s_type.frac_length
            out.append(res)
        return out

    def _mod_public_field(self, t_type, v, b):
        """(v mod b) for public modulus b via _mod protocol — placeholder:
        used only in finite-field conversions; implemented in phase B."""
        raise NotImplementedError('SecFld conversion lands with _mod (phase B)')

    # ======================================================================
    # randomness
    # ======================================================================

    def _randoms(self, sftype, n, bound=None):
        """n secure random values (PRSS; reference runtime.py:4023-4060)."""
        if issubclass(sftype, sectypes.SecureObject):
            field = sftype.field
        else:
            field = sftype
        m = len(self.parties)
        t = self.threshold
        if bound is None:
            bound = field.order
        else:
            bound = 1 << max(0, (bound // math.comb(m, t)).bit_length() - 1)
        x = thresha.np_pseudorandom_share(field, m, self.pid,
                                          self.prfs(bound), self._prss_uci(), n)
        if issubclass(sftype, sectypes.SecureObject):
            return [sftype(x[i].reshape(())) for i in range(n)]
        return x

    def _np_randoms(self, sftype, n, bound=None):
        if issubclass(sftype, sectypes.SecureObject):
            field = sftype.field
        else:
            field = sftype
        m = len(self.parties)
        t = self.threshold
        if bound is None:
            bound = field.order
        else:
            bound = 1 << max(0, (bound // math.comb(m, t)).bit_length() - 1)
        x = thresha.np_pseudorandom_share(field, m, self.pid,
                                          self.prfs(bound), self._prss_uci(), n)
        if issubclass(sftype, sectypes.SecureObject):
            return sftype.array(x)
        return x

    def _random(self, sftype, bound=None):
        x = self._randoms(sftype, 1, bound)
        return x[0] if isinstance(x, list) else x.reshape(())

    def random_bits(self, sftype, n, signed=False):
        """n secure uniformly random bits (list of secure numbers)."""
        arr = self.np_random_bits(sftype, n, signed)
        if issubclass(sftype, sectypes.SecureObject):
            out = []
            for i in range(n):
                o = sftype(arr.share[i].reshape(()))
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

        m = len(self.parties)
        t = self.threshold
        p = field.characteristic
        if p == 2:
            bits = self._prss_bits_char2(field, n)
        else:
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
            bits_pm1 = r * r2o.sqrt(INV=True)  # in {-1, +1}
            ones = field.array(np.ones(n, dtype=object))
            bits = (bits_pm1 + ones) >> 1  # map {-1,1} -> {0,1}
        if f:
            bits = bits << f
        return sftype.array(bits) if is_sec else bits

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

    def add(self, a, b):
        """Secure addition of a and b."""
        stype = self._sectype(a, b)
        sa, sb = self._share2(a, b)
        res = sa + sb
        return self._wrap(stype, res, array=self._is_array_op(a, b),
                          integral=self._integral(a) and self._integral(b))

    def sub(self, a, b):
        """Secure subtraction of a and b."""
        stype = self._sectype(a, b)
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
            sb = self._encode_public(stype, b)
            c = self._share(a) * sb  # public operand broadcasts
            if f and (a_int or b_int):
                c = c >> f  # exact: product divisible by 2^f
            elif f:
                c = self._trunc_field(c, f, stype.bit_length + f, stype)
            arr = self._is_array_op(a) or bool(c.shape)
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
            assert f, 'float constant needs fixed-point type'
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
        """Secure sum of elements of list x."""
        if isinstance(x, sectypes.SecureArray):
            return self.np_sum(x)
        if not x:
            return start
        stype = self._sectype(*x)
        acc = self._share(x[0])
        for xi in x[1:]:
            acc = acc + self._share(xi)
        if start:
            acc = acc + self._encode_public(stype, start)
        return self._wrap(stype, acc, array=False,
                          integral=all(self._integral(xi) for xi in x))

    def in_prod(self, x, y):
        """Secure dot product of lists x and y (one round)."""
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
        stype = self._sectype(a)
        if b == 254:  # AES S-box addition chain (reference runtime.py:1296)
            d = a
            c = self.mul(d, d)
            c = self.mul(c, c)
            c = self.mul(c, c)
            c = self.mul(c, d)
            c = self.mul(c, c)
            c = self.mul(c, c)
            c = self.mul(c, c)
            c = self.mul(c, d)
            c = self.mul(c, c)
            c = self.mul(c, c)
            return c
        if b == 0:
            return self._wrap(stype, self._encode_public(
                stype, 1), array=self._is_array_op(a), integral=True)
        if b < 0:
            raise NotImplementedError('negative exponent')
        res = None
        d = a
        for bit in bin(b)[:1:-1]:
            if bit == '1':
                res = d if res is None else self.mul(res, d)
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
        return self.is_zero_public(self.sub(a, b))

    def is_zero_public(self, a):
        """Secure public zero test of a (reference: runtime.py:879-929)."""
        stype = self._sectype(a) if isinstance(a, sectypes.SecureObject) else None
        field = stype.field if stype else type(a)
        share = self._share(a)
        m = len(self.parties)
        rel_size = field.order.bit_length() // self.options.sec_param
        threshold = 2 * self.threshold
        prfs = None
        if rel_size >= 2:  # large field: random r nonzero whp
            r = self._np_randoms(field, 1).reshape(())
        else:
            prfs = self.prfs(field.order)
            while True:
                rs = self._np_randoms(field, 2)
                r, s = rs[0], rs[1]
                rs_prod = r * s
                if rel_size == 0:
                    z = thresha.np_pseudorandom_share_0(
                        field, m, self.pid, prfs, self._prss_uci(), 1)
                    rs_prod = rs_prod + z[0]
                opened = self.output(rs_prod, threshold=threshold)
                if int(opened.value[()] if not opened.shape else
                       opened.value[0]) != 0:
                    break
        b = share * r
        if rel_size == 0 and prfs is not None:
            nz = max(b.size, 1)
            z = thresha.np_pseudorandom_share_0(
                field, m, self.pid, prfs, self._prss_uci(), nz)
            b = b + (z.reshape(b.shape) if b.shape else z[0].reshape(()))
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

    def np_reshape(self, a, shape):
        return self._local(a, lambda s: s.reshape(shape))

    def np_flatten(self, a):
        return self._local(a, lambda s: s.flatten())

    def np_transpose(self, a, axes=None):
        return self._local(a, lambda s: s.transpose(*axes) if axes
                           else s.transpose())

    def np_swapaxes(self, a, i, j):
        return self._local(a, lambda s: s.swapaxes(i, j))

    def np_copy(self, a):
        return self._local(a, lambda s: s.copy())

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
            return [self._wrap(stype, self._share(a)[i].reshape(()),
                               array=False, integral=self._integral(a))
                    for i in range(a.shape[0])]
        return [self.np_tolist(self.np_getitem(a, i))
                for i in range(a.shape[0])]

    def np_concatenate(self, arrays, axis=0):
        stype = self._sectype(*arrays)
        import jax.numpy as jnp
        datas = [self._share(x).data for x in arrays]
        field = stype.field
        nd = field.array._elem_ndim
        ax = axis % (datas[0].ndim - nd)
        out = field.array.from_data(jnp.concatenate(datas, axis=ax))
        return self._wrap(stype, out, array=True,
                          integral=all(self._integral(x) for x in arrays))

    def np_stack(self, arrays, axis=0):
        stype = self._sectype(*arrays)
        import jax.numpy as jnp
        field = stype.field
        datas = [self._share(x).data for x in arrays]
        out = field.array.from_data(jnp.stack(datas, axis=axis))
        return self._wrap(stype, out, array=True,
                          integral=all(self._integral(x) for x in arrays))

    def np_sum(self, a, axis=None):
        stype = self._sectype(a)
        share = self._share(a).sum(axis=axis)
        return self._wrap(stype, share, array=bool(share.shape),
                          integral=self._integral(a))

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
        """Secure matrix product of lists-of-lists A and B."""
        stype = self._sectype(*(A[0] + B[0]))
        An = self.np_fromlist([x for row in A for x in row]) \
            .reshape(len(A), len(A[0]))
        Bn = self.np_fromlist([x for row in B for x in row]) \
            .reshape(len(B), len(B[0]))
        if tr:
            Bn = self.np_transpose(Bn)
        Cn = self.np_matmul(An, Bn)
        return [[self.np_getitem(Cn, (i, j))
                 for j in range(Cn.shape[1])] for i in range(Cn.shape[0])]

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
        """Secure & (char-2 fields: multiplication)."""
        return self.mul(a, b)

    def xor(self, a, b):
        """Secure ^ (char-2 fields: addition)."""
        return self.add(a, b)

    def or_(self, a, b):
        """Secure | = a + b + a*b (char 2)."""
        return self.add(self.add(a, b), self.mul(a, b))

    def invert(self, a):
        """Secure ~ = 1 - a for bits (char 2)."""
        stype = self._sectype(a)
        one = self._encode_public(stype, 1)
        return self._wrap(stype, one - self._share(a),
                          array=self._is_array_op(a), integral=True)

    def if_else(self, c, x, y):
        """Secure selection c*x + (1-c)*y for c in {0, 1}."""
        if isinstance(x, list):
            return [self.if_else(c, xi, yi) for xi, yi in zip(x, y)]
        d = self.sub(x, y) if isinstance(x, sectypes.SecureObject) or \
            isinstance(y, sectypes.SecureObject) else x - y
        return self.add(self.mul(c, d), y if isinstance(y, sectypes.SecureObject)
                        else self._wrap(self._sectype(c),
                                        self._encode_public(self._sectype(c), y),
                                        array=False, integral=self._integral(y)))

    def if_swap(self, c, x, y):
        """Secure swap: [x, y] if c == 0 else [y, x]."""
        d = self.mul(c, self.sub(y, x))
        return [self.add(x, d), self.sub(y, d)]

    # -- comparison layer (phase B; see reference runtime.py:1443-1559) ----

    def sgn(self, a, l=None, LT=False, EQ=False):
        raise NotImplementedError('sgn lands in the comparison layer')

    def lt(self, a, b):
        return self.sgn(self.sub(a, b), LT=True)

    def eq(self, a, b):
        return self.sgn(self.sub(a, b), EQ=True)

    def np_less(self, a, b):
        raise NotImplementedError('np_less lands in the comparison layer')

    def np_equal(self, a, b):
        raise NotImplementedError('np_equal lands in the comparison layer')

    def mod(self, a, b):
        raise NotImplementedError('mod lands in the comparison layer')

    def _rec(self, a):
        raise NotImplementedError('fxp reciprocal lands in the fxp layer')


def _concat_field(field, arrays):
    """Concatenate 1-D field arrays."""
    import jax.numpy as jnp
    datas = [a.data for a in arrays]
    return field.array.from_data(jnp.concatenate(datas, axis=0))


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
    parser.add_argument('-H', '--HELP', action='store_true')
    parser.add_argument('-C', '--config')
    parser.add_argument('-P', dest='parties', action='append')
    parser.add_argument('-M', type=int, dest='M')
    parser.add_argument('-I', '--index', type=int)
    parser.add_argument('-T', '--threshold', type=int)
    parser.add_argument('-B', '--base-port', type=int, default=11365)
    parser.add_argument('--ssl', action='store_true')
    parser.add_argument('--sim', action='store_true')
    parser.add_argument('-L', '--bit-length', type=int, default=32)
    parser.add_argument('-K', '--sec-param', type=int, default=30)
    parser.add_argument('--no-prss', action='store_true')
    parser.add_argument('--no-async', action='store_true')
    parser.add_argument('--log-level', default='warning')
    parser.add_argument('-f', type=str, default='')
    args, _ = parser.parse_known_args(argv)

    logging.basicConfig(level=getattr(logging, args.log_level.upper(),
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
            # spawn the other m-1 parties as subprocesses (reference:
            # runtime.py:5156-5193)
            pid = 0
            import subprocess
            prog = sys.argv[0]
            for i in range(1, m):
                cmd = [sys.executable, prog] + sys.argv[1:] + ['-I', str(i)]
                subprocess.Popen(cmd)
    else:
        parties = [Party(i) for i in range(m)]
        pid = args.index if args.index is not None else 0

    if m > 1 and not options.sim and \
            os.getenv('MPYC_TPU_PARTY_DEVICE') is None:
        # Local multi-process parties cannot share one TPU chip; run the
        # per-party device math on CPU. Real deployments give each party its
        # own accelerator and set MPYC_TPU_PARTY_DEVICE=tpu (or axon).
        import jax
        try:
            jax.config.update('jax_platforms', 'cpu')
        except Exception:
            pass

    if options.sim and m > 1:
        from mpyc_tpu.parallel.simulator import SimRuntime
        rt = SimRuntime(m, options)
    else:
        rt = Runtime(pid, parties, options)
    sectypes.runtime = rt
    asyncoro.runtime = rt
    import mpyc_tpu
    mpyc_tpu.runtime = rt
    return rt


mpc = setup()
