"""Co-located simulator plane: all m parties on one device/mesh.

This is the benchmark/scaling plane promised in SURVEY.md §2.13/§7: every
share carries a leading party axis (m, ...), so the whole m-party protocol
becomes one dense array program —

  * share exchange (scatter rows of a split) = an axis transpose;
  * recombination = a Lagrange-weighted reduction over the party axis;
  * PRSS = per-subset PRF streams broadcast against the f_S vector.

Everything the per-party runtime does in m processes with TCP rounds runs
here as fused XLA ops, jittable end-to-end and shardable over a device mesh
(party axis and/or batch axis; XLA inserts the collectives). Results are
protocol-faithful in distribution: the eager paths replay the PRSS/host
randomness conventions bit-exactly, while the fused device rounds draw
their coefficient/bit streams from an independent dealer-style SHAKE key
(``_fused_key``, documented per kernel in models/pipelines.py), so the
joint share/output distribution matches a real deployment even though the
share values are not derived from the per-subset PRSS keys.

Trust model note: a single process holds all shares, so this plane is for
benchmarking, testing, and co-located deployments only.
"""

from __future__ import annotations

import itertools
import secrets as _secrets

import numpy as np
import jax.numpy as jnp

from mpyc_tpu import sectypes, thresha
from mpyc_tpu.utils.lazyjax import flush_on_load as _flush_jax
_flush_jax()  # this module imports jax directly: run deferred registrations
from mpyc_tpu.runtime import Runtime, Party, _concat_field


class SimRuntime(Runtime):
    """All-parties-in-one runtime with party-stacked shares."""

    def __init__(self, m, options):
        import mpyc_tpu
        mpyc_tpu.enable_compile_cache()  # TPU plane: persistent XLA cache
        parties = [Party(i) for i in range(m)]
        super().__init__(0, parties, options)
        # all PRSS keys live here (one per (m-t)-subset)
        t = self.threshold
        self._prss_keys = {
            S: _secrets.token_bytes(16)
            for S in itertools.combinations(range(m), m - t)}
        self.prfs.cache_clear()
        # fused-round machinery: independent PRF key for the compiled
        # reshare stream; the call counter lives ON DEVICE and is threaded
        # through every fused call (no host<->device traffic per round)
        self._fused_key = _secrets.token_bytes(32)
        self._fused_steps = {}
        self._fused_states = {}
        self._fused_ctr = None

    is_simulator = True
    _pax = 1  # leading party axis in share arrays

    @property
    def threshold(self):
        return self._threshold

    @threshold.setter
    def threshold(self, t):
        self._threshold = t
        m = len(self.parties)
        self.prfs.cache_clear()
        self._prss_keys = {
            S: _secrets.token_bytes(16)
            for S in itertools.combinations(range(m), m - t)}

    # -- lifecycle: no transport ------------------------------------------

    def start(self):
        import time
        self.start_time = time.time()

    def shutdown(self):
        import time
        elapsed = time.time() - (self.start_time or time.time())
        import logging
        logging.getLogger(__name__).info(
            f'Stop MPyC-TPU (sim, m={len(self.parties)}) '
            f'-- elapsed time: {elapsed:.4f}s')

    def barrier(self, name=None):
        pass

    def transfer(self, obj, senders=None, receivers=None,
                 sender_receivers=None):
        """Plain-object exchange on the co-located plane: the one process
        plays every party, so each sender's object is `obj` itself
        (pickle round-trip preserved for copy semantics, like the base
        plane's self-transfer)."""
        import pickle
        m = len(self.parties)
        dup = lambda: pickle.loads(pickle.dumps(obj))  # noqa: E731
        if sender_receivers is not None:
            return {s: dup() for s, r in sender_receivers if r == self.pid}
        if isinstance(senders, int):
            return dup()
        snd = list(range(m) if senders is None else senders)
        return [dup() for _ in snd]

    # -- primitives with party-stacked shares ------------------------------
    # A share array has shape (m,) + logical_shape (+ limb axes).

    def _distribute(self, x, senders):
        if x == []:
            return [[] for _ in senders]
        stype = type(x[0])
        is_arr = issubclass(stype, sectypes.SecureArray)
        sctype = stype.sectype if is_arr else stype
        field = sctype.field
        m = len(self.parties)
        t = self.threshold
        y = []
        for _peer in senders:
            objs = []
            for xi in x:
                secret = xi.share  # logical-shape field array (no party axis)
                flat = secret.flatten() if secret.shape else secret.reshape(1)
                sh = thresha.np_random_split(field, flat, t, m, self._rng)
                shape = (m,) + (xi.shape if is_arr else ())
                share = sh.reshape(shape) if is_arr and xi.shape else \
                    (sh.reshape((m,)) if not is_arr else sh.reshape((m,)))
                objs.append(self._wrap_stacked(sctype, share, is_arr,
                                               self._integral(xi)))
            y.append(objs)
        return y

    def _share(self, x):
        """Party-stacked share of x; public-valued objects broadcast.

        Secure objects built from public constants (type coercion, pow with
        exponent 0, ...) hold logical-shape shares; a public value's Shamir
        sharing is the constant polynomial, i.e. every party holds the value
        itself — a broadcast over the party axis.
        """
        m = len(self.parties)
        if isinstance(x, sectypes.SecureArray):
            s = x.share
            if tuple(s.shape) == tuple(x.shape):  # no party axis yet
                return s.from_data(jnp.broadcast_to(
                    s.data[None], (m,) + s.data.shape))
            return s
        if isinstance(x, sectypes.SecureObject):
            s = x.share
            if s.shape == ():
                return s.from_data(jnp.broadcast_to(
                    s.data[None], (m,) + s.data.shape))
            return s
        return x

    def _share_like(self, field_arr):
        """Broadcast a public logical field array over the party axis
        (a public constant's Shamir sharing is the constant polynomial)."""
        m = len(self.parties)
        return field_arr.from_data(jnp.broadcast_to(
            field_arr.data[None], (m,) + field_arr.data.shape))

    def _share2(self, a, b):
        sa, sb = self._share(a), self._share(b)
        m = len(self.parties)
        ra, rb = len(sa.shape), len(sb.shape)
        if ra < rb:
            sa = sa.reshape((m,) + (1,) * (rb - ra) + sa.shape[1:])
        elif rb < ra:
            sb = sb.reshape((m,) + (1,) * (ra - rb) + sb.shape[1:])
        return sa, sb

    def _wrap_stacked(self, sctype, share, is_arr, integral):
        res = self._wrap(sctype, share, array=is_arr, integral=integral)
        if is_arr:
            res.shape = share.shape[1:]
        return res

    def output(self, x, receivers=None, threshold=None, raw=False):
        x_is_list = isinstance(x, list)
        xl = list(x) if x_is_list else [x]
        if not xl:
            return []
        t = self.threshold if threshold is None else threshold
        stype = type(xl[0])
        if issubclass(stype, sectypes.SecureObject):
            is_arr = issubclass(stype, sectypes.SecureArray)
            sctype = stype.sectype if is_arr else stype
            field = sctype.field
            shares = [self._share(xi) for xi in xl]
        else:
            field = xl[0].field
            sctype = None
            shares = xl
        ys = []
        for s in shares:
            pts = [(i + 1, s.from_data(s.data[i]))
                   for i in range(t + 1)]
            rec = thresha.np_recombine(field, [
                (xc, sh.flatten() if sh.shape else sh.reshape(1))
                for xc, sh in pts])
            logical = s.shape[1:]
            rec = rec.reshape(logical) if logical else rec.reshape(())
            ys.append(rec)
        if sctype is not None and not raw:
            conv = stype._output_conversion
            if conv is not None:
                ys = [conv(a) for a in ys]
        elif sctype is not None and not is_arr:
            # raw open of scalar secure numbers: field elements (parity
            # with the base plane / reference runtime.py:593-596)
            ys = [field(int(a.value[()])) for a in ys]
        return ys if x_is_list else ys[0]

    def _reshare(self, x):
        x_is_list = isinstance(x, list)
        xl = x if x_is_list else [x]
        t = self.threshold
        if t == 0:
            return x
        field = xl[0].field
        m = len(self.parties)
        ys = []
        for xi in xl:
            if field.characteristic > 2 and field.ext_deg == 1 and \
                    not isinstance(xi.data, np.ndarray):
                # device-resident prime-field shares: one compiled program
                # for the whole round (RNG + split + exchange + recombine)
                ys.append(self._reshare_fused(xi))
                continue
            if field.characteristic == 2 and field.order > 2 and \
                    not isinstance(xi.data, np.ndarray):
                ys.append(self._reshare2_fused(xi))
                continue
            # host/extension-field fallback: eager round
            # xi: (m,) + logical shape; each party splits its share
            resplit = thresha.np_random_split(field, xi, t, m, self._rng)
            # resplit: (m_recv, m_sender) + logical; recombine over senders
            pts = [(i + 1, resplit[:, i]) for i in range(2 * t + 1)]
            acc = None
            for xc, sh in pts:
                vec = thresha._recombination_vector(
                    field, tuple(range(1, 2 * t + 2)), 0)
                term = sh * vec[xc - 1]
                acc = term if acc is None else acc + term
            ys.append(acc)
        return ys if x_is_list else ys[0]

    def _fused_state(self):
        import jax.numpy as _jnp
        from mpyc_tpu.ops import keccak
        state = self._fused_states.get('base')
        if state is None:
            hi, lo = keccak._absorb_host(self._fused_key + bytes(8))
            state = _jnp.asarray(np.stack([np.array(hi, np.uint32),
                                           np.array(lo, np.uint32)]))
            self._fused_states['base'] = state
        if self._fused_ctr is None:
            self._fused_ctr = _jnp.zeros(2, _jnp.uint32)
        return state

    def _get_step(self, key, build, data_shapes):
        """Fused step by key, trace-cached on disk when MPYC_TPU_CACHE=1
        (utils.tracecache: jax re-traces every program per process; the
        big fused protocol graphs cost 5-10 s of host time each)."""
        step = self._fused_steps.get(key)
        if step is None:
            import jax
            import jax.numpy as _jnp
            from mpyc_tpu.utils import tracecache
            ex = [jax.ShapeDtypeStruct(s, _jnp.uint32) for s in data_shapes]
            ex += [jax.ShapeDtypeStruct((2, 25), _jnp.uint32),
                   jax.ShapeDtypeStruct((2,), _jnp.uint32)]
            step = tracecache.cached_step(repr(key), build, tuple(ex))
            self._fused_steps[key] = step
        return step

    def _fused_flat(self, key_base, build, datas, elem_ndim):
        """Run a fused step on flattened, bucket-padded party-stacked data.

        Every fused reshare/mul flattens its logical dims to (m, n[, L])
        and pads n up to a power-of-two bucket (floor 64), so ONE traced
        + compiled program serves a whole range of protocol shapes — the
        per-shape 5-10 s trace dominated cold-start (e.g. np_aes -b 64
        first run: 105 s, VERDICT r3). All-zero pad rows are valid
        sharings of 0. datas: identically-shaped (m, *logical, [L])
        device arrays; elem_ndim: 1 for prime limbs, 0 for GF(2^d).
        """
        d0 = datas[0]
        m = d0.shape[0]
        split = d0.ndim - elem_ndim
        logical = d0.shape[1:split]
        tail = d0.shape[split:]
        n = 1
        for s2 in logical:
            n *= int(s2)
        n_pad = 64
        while n_pad < n:
            n_pad *= 2
        flats = []
        for d in datas:
            f = d.reshape((m, n) + tail)
            if n_pad != n:
                f = jnp.concatenate(
                    [f, jnp.zeros((m, n_pad - n) + tail, jnp.uint32)],
                    axis=1)
            flats.append(f)
        key = key_base + (n_pad,) + tail
        step = self._get_step(key, build, [f.shape for f in flats])
        state = self._fused_state()
        out, self._fused_ctr = step(*flats, state, self._fused_ctr)
        return out[:, :n].reshape(d0.shape)

    def _reshare_fused(self, xi):
        """Compiled GRR98 round (pipelines.make_reshare_step), counter-mode
        SHAKE randomness keyed independently of the eager-plane RNG."""
        from mpyc_tpu.models import pipelines

        field = xi.field
        t = self.threshold
        m = len(self.parties)
        out = self._fused_flat(
            (field.modulus, t, 'reshare'),
            lambda: pipelines.make_reshare_step(field.modulus, t, m),
            [xi.data], 1)
        return field.array.from_data(out)

    def _reshare2_fused(self, xi):
        """Compiled GRR98 round over GF(2^d) (pipelines.make_reshare2_step)."""
        from mpyc_tpu.models import pipelines

        field = xi.field
        t = self.threshold
        m = len(self.parties)
        md = int(field.modulus)
        out = self._fused_flat(
            (2, md, t, 'reshare'),
            lambda: pipelines.make_reshare2_step(md, t, m),
            [xi.data], 0)
        return field.array.from_data(out)

    def _mul_reshare2_fused(self, sa, sb):
        """Whole GF(2^d) secure multiplication (carry-less product + GRR98
        reshare) as one compiled program."""
        from mpyc_tpu.models import pipelines

        field = sa.field
        t = self.threshold
        m = len(self.parties)
        da, db = sa.data, sb.data
        if da.shape != db.shape:
            shape = np.broadcast_shapes(da.shape, db.shape)
            da = jnp.broadcast_to(da, shape)
            db = jnp.broadcast_to(db, shape)
        md = int(field.modulus)
        out = self._fused_flat(
            (2, md, t, 'mul'),
            lambda: pipelines.make_reshare2_step(md, t, m, fuse_mul=True),
            [da, db], 0)
        return field.array.from_data(out)

    def _mul_reshare_fused(self, sa, sb):
        """Whole secure multiplication (local product + GRR98 reshare) as
        one compiled device program (pipelines.make_reshare_step with
        fuse_mul) — the hot path of mul/np_multiply on this plane."""
        import jax.numpy as _jnp
        from mpyc_tpu.models import pipelines

        field = sa.field
        t = self.threshold
        m = len(self.parties)
        da, db = sa.data, sb.data
        if da.shape != db.shape:
            shape = np.broadcast_shapes(da.shape, db.shape)
            da = _jnp.broadcast_to(da, shape)
            db = _jnp.broadcast_to(db, shape)
        out = self._fused_flat(
            (field.modulus, t, 'mul'),
            lambda: pipelines.make_reshare_step(field.modulus, t, m,
                                                fuse_mul=True),
            [da, db], 1)
        return field.array.from_data(out)

    def mul(self, a, b):
        """Secure multiplication; both-secret products on device data run
        as one fused program (product + degree reduction, see
        _mul_reshare_fused). Public-operand, fxp >>-before-reshare, host
        and extension-field cases fall back to the generic plane."""
        stype = self._sectype(a)
        f = stype.frac_length
        if isinstance(b, sectypes.SecureObject) and self.threshold > 0:
            field = stype.field
            a_int, b_int = self._integral(a), self._integral(b)
            if field.characteristic > 2 and field.ext_deg == 1 and \
                    not (f and (a_int or b_int)):
                sa, sb = self._share2(a, b)
                if not isinstance(sa.data, np.ndarray) and \
                        not isinstance(sb.data, np.ndarray):
                    c = self._mul_reshare_fused(sa, sb)
                    if f:
                        c = self._trunc_field(c, f, stype.bit_length + f,
                                              stype)
                    return self._wrap(stype, c,
                                      array=self._is_array_op(a, b),
                                      integral=a_int and b_int)
            elif field.characteristic == 2 and field.order > 2 and not f:
                sa, sb = self._share2(a, b)
                if not isinstance(sa.data, np.ndarray) and \
                        not isinstance(sb.data, np.ndarray):
                    c = self._mul_reshare2_fused(sa, sb)
                    return self._wrap(stype, c,
                                      array=self._is_array_op(a, b),
                                      integral=a_int and b_int)
        return super().mul(a, b)

    def np_sgn(self, a, l=None, LT=False, EQ=False):
        """Secure signum; device-resident prime-field inputs run the whole
        comparison as ONE compiled program (pipelines.make_sgn_step):
        stream randomness, masked open, bit algebra, product trees with
        in-kernel GRR98 reductions, blinded zero test — no eager
        primitives and no host round trips (the eager path dispatched
        ~900 primitives and compiled ~139 programs per batch shape)."""
        assert not (LT and EQ)
        stype = self._sectype(a)
        field = stype.field
        l_eff = l or stype.bit_length
        k = self.options.sec_param
        from mpyc_tpu.ops import fieldops
        # On CPU backends only small fields take the fused program: the
        # local XLA-CPU compiler chokes on the full comparison graph beyond
        # one-limb fields (minutes of compile), while the eager host plane
        # is fast there. TPU backends compile every width quickly (the
        # whole protocol is one Pallas kernel for n >= 1024).
        width_ok = (not fieldops._cpu_backend()
                    or field.modulus.bit_length() <= 32)
        if (field.characteristic > 2 and field.ext_deg == 1
                and self.threshold > 0 and width_ok
                and l_eff + k + 2 <= field.modulus.bit_length()):
            sh = self._share(a)
            if not isinstance(sh.data, np.ndarray):
                return self._np_sgn_fused(stype, a, sh, l_eff, LT, EQ)
            if not fieldops._cpu_backend():
                # host-resident shares (small arrays computed by the host
                # kernels): on TPU backends the compiled comparison still
                # wins over the eager tunnel round trips — upload and fuse
                sh = field.array.from_data(jnp.asarray(np.asarray(sh.data)))
                return self._np_sgn_fused(stype, a, sh, l_eff, LT, EQ)
        return super().np_sgn(a, l=l, LT=LT, EQ=EQ)

    # Max flat batch per fused comparison call. The whole-protocol Pallas
    # kernel (pipelines.make_sgn_step) keeps everything in VMEM per
    # (8, 128)-element tile, so HBM holds only the input/output shares —
    # 1M-element chunks are ~50 MB and amortize dispatch (measured
    # throughput: 64Ki 1.6e7 -> 1M 4.3e7 ops/s at l=14).
    _SGN_CHUNK = 1 << 20

    def _np_sgn_fused(self, stype, a, sh, l, LT, EQ):
        field = stype.field
        m = len(self.parties)
        shape = a.shape if isinstance(a, sectypes.SecureArray) else ()
        n = 1
        for s in shape:
            n *= int(s)
        L = sh.data.shape[-1]
        data = sh.data.reshape(m, n, L)
        # multi-limb fields (> 64-bit, e.g. SecInt(64)'s 96-bit field):
        # the whole-protocol compile grows steeply with the bucket size
        # (n=1024 ~5 min through the remote service, n=4096 >20 min), so
        # larger batches chunk through the single 1024-wide program —
        # bounded first-compile, throughput amortized over chunks
        chunk = self._SGN_CHUNK if L <= 2 else 1024
        if n > chunk:
            # slice chunks on the host: device-side slicing would emit
            # one eager slice program per distinct offset (each a
            # multi-second compile through a remote-attached backend).
            # Chunk outputs stay on device and concatenate in one op, so
            # dispatches pipeline without a per-chunk host sync.
            host = np.asarray(data)
            outs = [self._sgn_fused_flat(
                        stype, jnp.asarray(host[:, j0:j0 + chunk]),
                        l, LT, EQ)
                    for j0 in range(0, n, chunk)]
            out = jnp.concatenate(outs, axis=1) if len(outs) > 1 \
                else outs[0]
        else:
            out = self._sgn_fused_flat(stype, data, l, LT, EQ)
        if shape:
            z = field.array.from_data(out.reshape((m,) + shape + (L,)))
        else:
            z = field.array.from_data(out.reshape(m, L))
        return self._wrap(stype, z, array=bool(shape), integral=True)

    def _sgn_fused_flat(self, stype, data, l, LT, EQ):
        """One fused-comparison call on (m, n, L) flat shares -> same."""
        from mpyc_tpu.models import pipelines

        field = stype.field
        f = stype.frac_length
        t = self.threshold
        m = len(self.parties)
        k = self.options.sec_param
        n, L = data.shape[1], data.shape[2]
        # shape buckets: all-zero rows are valid sharings of 0. Each
        # bucket is one trace + compile, persisted by the trace/compile
        # caches — and a fused-comparison compile costs ~2 min through
        # the remote compile service, so buckets are COARSE on TPU:
        # floor 1024 (every small comparison rides the one whole-protocol
        # Pallas program at sub-ms), then powers of FOUR (compute waste
        # <= 4x of a fast kernel beats another 2-minute compile). CPU
        # keeps fine powers-of-two buckets from a floor of 64.
        from mpyc_tpu.ops import keccak
        if keccak._pallas_available():
            n_pad, growth = 1024, 4
        else:
            n_pad, growth = 64, 2
        while n_pad < n:
            n_pad *= growth
        n_pad = min(n_pad, self._SGN_CHUNK)
        assert n <= n_pad
        if n_pad != n:
            data = jnp.concatenate(
                [data, jnp.zeros((m, n_pad - n, L), jnp.uint32)], axis=1)
        key = (field.modulus, t, l, k, LT, EQ, f, n_pad)
        step = self._get_step(
            key, lambda: pipelines.make_sgn_step(field.modulus, t, m, l, k,
                                                 LT=LT, EQ=EQ, f=f),
            [(m, n_pad, L)])
        state = self._fused_state()
        out, self._fused_ctr = step(data, state, self._fused_ctr)
        return out[:, :n]

    def _convert(self, x, t_type):
        """Field conversion with party-stacked shares (PRSS correlated
        masks drawn with one uci so both fields see the same integers;
        base-plane twin: runtime.py _convert, reference runtime.py:691-787).
        Handles secure arrays too: all items flatten into one batch along
        the logical axis, one mask/open round serves everything.
        """
        import math

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
            d_senders = math.comb(m, t)
            bound = 1 << max(0, (k + l) - d_senders.bit_length() + 1)
        prfs_s = self.prfs(bound)
        uci = self._prss_uci()
        if s_is_ff:
            # arbitrary bound q: field-independent host integer stream
            # embeds identically into both fields (reference:
            # runtime.py:758-761 / thresha host PRF)
            s_r = self._stacked_prss_host(s_field, prfs_s, uci, n)
            t_r = self._stacked_prss_host(t_field, prfs_s, uci, n)
        else:
            s_r = self._stacked_prss(s_field, prfs_s, uci, n)  # (m, n)
            t_r = self._stacked_prss(t_field, prfs_s, uci, n)  # same ints

        d = t_ctype.frac_length - s_ctype.frac_length
        shares = [self._share(xi) for xi in x]     # each (m,) + logical
        if is_arr:
            # prime-field share data: (m,) + logical + (L,)
            datas = [jnp.reshape(s.data, (m, sz, s.data.shape[-1]))
                     for s, sz in zip(shares, sizes)]
            stacked = s_field.array.from_data(
                jnp.concatenate(datas, axis=1))               # (m, n)
        else:
            stacked = s_field.array.from_data(
                jnp.stack([s.data for s in shares], axis=1))  # (m, n)
        if d < 0:
            stacked = self.np_trunc_field(stacked, -d, s_ctype.bit_length,
                                          s_ctype)
        if s_field.is_signed:
            offset = s_field.order // 2 if s_is_ff else 1 << (l - 1)
        else:
            offset = 0
        masked = stacked + offset + s_r
        c = self.output(masked)  # public (n,) values in s_field
        if s_is_ff:
            # batched [GMS10] public-modulus reduction in the target field
            # (scalars and arrays alike; runtime.py _convert's twin)
            c_ints = np.array([int(v) for v in
                               np.asarray(c.value).reshape(-1)],
                              dtype=object)
            v = self._share_like(t_field.array(c_ints)) - t_r   # (m, n)
            sec = self._wrap(t_ctype, v, array=True, integral=True)
            sec = self._mod(sec, int(s_field.modulus))
            v = self._share(sec) - offset
        else:
            emb = self._embed_field_values(c, t_field)   # (n,) public
            v = self._share_like(emb) - t_r - offset     # (m, n)
        if d > 0:
            v = v * (1 << d)
        integral = not s_ctype.frac_length
        out = []
        off = 0
        for size, shape in zip(sizes, shapes):
            piece = v[:, off:off + size]
            off += size
            if shape is not None:
                res = self._wrap(t_ctype, piece.reshape((m,) + shape),
                                 array=True, integral=integral)
            else:
                res = t_ctype(piece.reshape((m,)))
                if issubclass(t_ctype, sectypes.SecureFixedPoint):
                    res.integral = integral
            out.append(res)
        return out

    # PRSS: stacked over parties ------------------------------------------

    def _stacked_prss_host(self, field, prfs, uci, n):
        """Party-stacked PRSS shares from the host integer PRF stream
        (arbitrary bounds; same integers embed into any field)."""
        m = len(self.parties)
        acc = None
        for S, prf in prfs.items():
            vals = field.array(prf.host_integers(uci, (n,)))
            rows = []
            for i in range(m):
                if i in S:
                    contrib = vals * int(thresha._f_S_i(field, m, i, S))
                    rows.append(contrib.data)
                else:
                    rows.append(jnp.zeros_like(vals.data))
            stacked = field.array.from_data(jnp.stack(rows, axis=0))
            acc = stacked if acc is None else acc + stacked
        return acc

    def _stacked_prss(self, field, prfs, uci, n, zero=False):
        m = len(self.parties)
        acc = None
        for S, prf in prfs.items():
            if zero:
                d = m - len(S)
                vals = prf.field_array(field, uci, (n, d))
            else:
                vals = prf.field_array(field, uci, (n,))
            rows = []
            for i in range(m):
                if i in S:
                    if zero:
                        i1 = i + 1
                        y = None
                        for j in range(d):
                            v = vals[:, j]
                            y = v if y is None else (y + v)
                            y = y * i1
                        contrib = y * int(thresha._f_S_i(field, m, i, S))
                    else:
                        contrib = vals * int(thresha._f_S_i(field, m, i, S))
                    rows.append(contrib.data)
                else:
                    rows.append(jnp.zeros_like(vals.data if not zero
                                               else vals[:, 0].data))
            stacked = field.array.from_data(jnp.stack(rows, axis=0))
            acc = stacked if acc is None else acc + stacked
        return acc

    def _randoms(self, sftype, n, bound=None):
        import math
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
        x = self._stacked_prss(field, self.prfs(bound), self._prss_uci(), n)
        if issubclass(sftype, sectypes.SecureObject):
            return [sftype(x[:, i]) for i in range(n)]
        return x

    _np_randoms_base = Runtime._np_randoms

    def _np_randoms(self, sftype, n, bound=None):
        import math
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
        x = self._stacked_prss(field, self.prfs(bound), self._prss_uci(), n)
        if issubclass(sftype, sectypes.SecureObject):
            res = sftype.array(x)
            res.shape = x.shape[1:]
            return res
        return x

    def random_bits(self, sftype, n, signed=False):
        arr = self.np_random_bits(sftype, n, signed)
        share = self._share(arr) if isinstance(arr, sectypes.SecureObject) \
            else arr
        out = []
        for i in range(n):
            piece = share.from_data(share.data[:, i])
            if issubclass(sftype, sectypes.SecureObject):
                o = sftype(piece)
                if issubclass(sftype, sectypes.SecureFixedPoint):
                    o.integral = True
            else:
                o = piece
            out.append(o)
        return out

    def np_random_bits(self, sftype, n, signed=False):
        if issubclass(sftype, sectypes.SecureObject):
            field = sftype.field
            f = sftype.frac_length
            is_sec = True
        else:
            field = sftype
            f = 0
            is_sec = False
        m = len(self.parties)
        t = self.threshold
        p = field.characteristic
        if p == 2:
            bits = self._stacked_prss(field, self.prfs(2),
                                      self._prss_uci(), n)
            if is_sec:
                res = sftype.array(bits)
                res.shape = bits.shape[1:]
                return res
            return bits
        prfs = self.prfs(field.order)
        parts_r, parts_r2 = [], []
        need = n
        while need:
            _r = self._stacked_prss(field, prfs, self._prss_uci(), need)
            z = self._stacked_prss(field, prfs, self._prss_uci(), need,
                                   zero=True)
            r2_open = self.output(_r * _r + z, threshold=2 * t)
            good = np.array([int(v) != 0 for v in r2_open.value.reshape(-1)])
            idx = np.nonzero(good)[0]
            if len(idx) == need and not parts_r:
                parts_r, parts_r2 = [_r], [r2_open]
                need = 0
            else:
                parts_r.append(_r[:, idx])
                parts_r2.append(r2_open[idx])
                need -= len(idx)
        if len(parts_r) > 1:
            r = parts_r[0]
            field_cls = field.array
            r = field_cls.from_data(jnp.concatenate(
                [p_.data for p_ in parts_r], axis=1))
            r2o = _concat_field(field, parts_r2)
        else:
            r, r2o = parts_r[0], parts_r2[0]
        inv_sqrt = r2o.sqrt(INV=True)  # public (n,)
        bits_pm1 = r * inv_sqrt        # broadcast over party axis
        if signed:
            bits = bits_pm1
        else:
            ones = field.array(np.ones(1, dtype=object))
            bits = (bits_pm1 + ones) >> 1
        if f:
            bits = bits << f
        if is_sec:
            res = sftype.array(bits)
            res.shape = bits.shape[1:]
            return res
        return bits

    def is_zero_public(self, a):
        stype = self._sectype(a) if isinstance(a, sectypes.SecureObject) else None
        field = stype.field if stype else type(a)
        share = self._share(a)
        m = len(self.parties)
        rel_size = field.order.bit_length() // self.options.sec_param
        threshold = 2 * self.threshold
        prfs = None
        if rel_size >= 2:
            r = self._np_randoms(field, 1)
            r = r[:, 0:1]  # (m, 1)
            r = field.array.from_data(r.data[:, 0])
        else:
            prfs = self.prfs(field.order)
            while True:
                rs = self._np_randoms(field, 2)
                r = field.array.from_data(rs.data[:, 0])
                s = field.array.from_data(rs.data[:, 1])
                rs_prod = r * s
                if rel_size == 0:
                    z = self._stacked_prss(field, prfs, self._prss_uci(), 1,
                                           zero=True)
                    rs_prod = rs_prod + field.array.from_data(z.data[:, 0])
                opened = self.output(rs_prod, threshold=threshold)
                if int(opened.value[()]) != 0:
                    break
        b = share * r if not share.shape[1:] else \
            share * r.reshape((m,) + (1,) * len(share.shape[1:]))
        if rel_size == 0 and prfs is not None:
            nz = int(np.prod(share.shape[1:], dtype=np.int64)) \
                if share.shape[1:] else 1
            z = self._stacked_prss(field, prfs, self._prss_uci(), nz,
                                   zero=True)
            zr = z.reshape(share.shape) if share.shape[1:] else \
                field.array.from_data(z.data[:, 0])
            b = b + zr
        c = self.output(b, threshold=threshold)
        if c.shape:
            return np.array([int(v) == 0 for v in c.value.reshape(-1)]) \
                .reshape(c.shape)
        return int(c.value[()]) == 0

    # logical-shape accounting ---------------------------------------------

    def _wrap(self, stype, share, array=None, integral=None):
        res = super()._wrap(stype, share, array=array, integral=integral)
        if isinstance(res, sectypes.SecureArray):
            res.shape = share.shape[1:]
        return res

    # local shape ops must skip the party axis
    def _local(self, a, fn, integral=None):
        stype = self._sectype(a)
        share = self._share(a)
        m = len(self.parties)
        parts = [fn(share.from_data(share.data[i]))
                 for i in range(m)]
        out = share.from_data(jnp.stack([p.data for p in parts], axis=0))
        return self._wrap(stype, out, array=True,
                          integral=self._integral(a) if integral is None
                          else integral)

    def np_getitem(self, a, idx):
        stype = self._sectype(a)
        share = self._share(a)
        if not isinstance(idx, tuple):
            idx = (idx,)
        share2 = share[(slice(None),) + idx]
        # 0-d logical results become scalar secure numbers, like the base
        # plane's np_getitem (and the reference's, runtime.py:2637+)
        return self._wrap(stype, share2, array=bool(share2.shape[1:]),
                          integral=self._integral(a))

    def np_sum(self, a, axis=None, keepdims=False, initial=0):
        stype = self._sectype(a)
        share = self._share(a)
        nd = len(share.shape) - 1
        if axis is None:
            axes = list(range(nd))
        elif isinstance(axis, int):
            axes = [axis % nd]
        else:
            axes = sorted(i % nd for i in axis)
        for ax in reversed(axes):
            share = share.sum(axis=ax + 1)
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
        return self._wrap(stype, share, array=True, integral=integral)

    def np_matmul(self, a, b):
        stype = self._sectype(a, b)
        f = stype.frac_length
        a_int, b_int = self._integral(a), self._integral(b)
        a_sec = isinstance(a, sectypes.SecureObject)
        b_sec = isinstance(b, sectypes.SecureObject)
        both_sec = a_sec and b_sec
        sa = self._share(a) if a_sec else self._encode_public(stype, a)
        sb = self._share(b) if b_sec else self._encode_public(stype, b)
        # Align the party axis (leading dim of secure shares) with the
        # logical matmul batch dims: logical shapes right-align, the party
        # axis stays leftmost and broadcasts against the peer's batch dims.
        la = sa.shape[1:] if a_sec else sa.shape
        lb = sb.shape[1:] if b_sec else sb.shape
        a_vec = len(la) == 1  # numpy matmul vector promotion, done here so
        b_vec = len(lb) == 1  # the party axis is never mistaken for a row dim
        if a_vec:
            sa = sa.reshape(sa.shape[:-1] + (1,) + sa.shape[-1:])
            la = (1,) + la
        if b_vec:
            sb = sb.reshape(sb.shape + (1,))
            lb = lb + (1,)
        rank = max(len(la), len(lb))
        m = len(self.parties)
        if a_sec and len(la) < rank:
            sa = sa.reshape((m,) + (1,) * (rank - len(la)) + la)
        if b_sec and len(lb) < rank:
            sb = sb.reshape((m,) + (1,) * (rank - len(lb)) + lb)
        c = sa @ sb  # party axis broadcasts as leading batch dim
        if a_vec:
            c = c[..., 0, :]
        if b_vec:
            c = c[..., 0]
        if f and (a_int or b_int):
            c = c >> f
        if both_sec:
            c = self._reshare(c)
        if f and not (a_int or b_int):
            c = self._trunc_field(c, f, stype.bit_length + f, stype)
        return self._wrap(stype, c, array=True, integral=a_int and b_int)

    def trunc(self, x, f=None, l=None):
        x_is_list = isinstance(x, list)
        xl = x if x_is_list else [x]
        stype = self._sectype(xl[0])
        if f is None:
            f = stype.frac_length
        if l is None:
            l = stype.bit_length
        if issubclass(stype, sectypes.SecureFixedPoint):
            l += f
        ys = [self._wrap(stype, self._trunc_field(xi.share, f, l, stype),
                         array=isinstance(xi, sectypes.SecureArray),
                         integral=False)
              for xi in xl]
        return ys if x_is_list else ys[0]

    def reciprocal(self, a):
        stype = self._sectype(a)
        field = stype.field
        m = len(self.parties)
        logical = a.share.shape[1:]
        n = int(np.prod(logical, dtype=np.int64)) if logical else 1
        while True:
            r = self._np_randoms(field, n)
            r = r.reshape((m,) + logical) if logical else r.reshape((m,))
            c = self._reshare(r * a.share)
            c_open = self.output(c)
            vals = c_open.value.reshape(-1) if c_open.shape else \
                np.array([c_open.value[()]])
            if all(int(v) != 0 for v in vals):
                break
        res = r * c_open.reciprocal()
        if stype.frac_length:
            res = res * (1 << (2 * stype.frac_length))
        return self._wrap(stype, res, array=self._is_array_op(a),
                          integral=False)

    def np_fromlist(self, x):
        stype = self._sectype(*x)
        field = stype.field
        datas = [self._share(xi).data for xi in x]
        out = field.array.from_data(jnp.stack(datas, axis=1))
        return self._wrap(stype, out, array=True,
                          integral=all(self._integral(xi) for xi in x))

    def np_tolist(self, a):
        stype = self._sectype(a)
        share = self._share(a)
        logical = share.shape[1:]
        if len(logical) == 1:
            return [self._wrap(stype,
                               share.from_data(share.data[:, i]),
                               array=False, integral=self._integral(a))
                    for i in range(logical[0])]
        return [self.np_tolist(self.np_getitem(a, i))
                for i in range(logical[0])]

    def _trunc_field(self, arr, f, l, stype):
        field = stype.field
        m = len(self.parties)
        logical = arr.shape[1:]
        n = int(np.prod(logical, dtype=np.int64)) if logical else 1
        flat = arr.reshape(m, n)
        k = self.options.sec_param
        r_bits = self.np_random_bits(field, f * n)     # (m, f*n)
        r_mat = r_bits.reshape(m, n, f)
        r_modf = None
        for j in range(f):
            term = field.array.from_data(r_mat.data[:, :, j]) << j
            r_modf = term if r_modf is None else r_modf + term
        r_divf = self._np_randoms(field, n, 1 << (k + l - f))  # (m, n)
        ar = flat + r_modf
        c = self.output(ar + ((1 << (l - 1)) + (r_divf << f)))
        c_modf = c.mod_pow2(f)
        y = (ar - c_modf) >> f
        return y.reshape((m,) + logical) if logical else y.reshape((m,))
