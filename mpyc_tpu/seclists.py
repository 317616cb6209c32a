"""Oblivious lists with secret-index reads and writes.

Parity target: /root/reference/mpyc/seclists.py — a list of secure numbers
where the index used in reads/updates/insertions/deletions may itself be
secret (a secure number or a secindex unit vector); access patterns reveal
nothing about secret indices.
"""

from mpyc_tpu import sectypes

runtime = None


class secindex:
    """Secure index: a unit vector with an offset (reference seclists.py:386)."""

    __slots__ = ('value', 'offset', 'sectype', '_num')

    def __init__(self, *args, offset=0, sectype=None):
        self._num = None
        if sectype is not None:
            # args is an iterable of bits forming a unit vector
            self.value = list(*args) if args else []
            self.sectype = sectype
        else:
            x = args[0]
            if isinstance(x, secindex):
                self.value = list(x.value)
                self.sectype = x.sectype
                offset += x.offset
            elif isinstance(x, sectypes.SecureNumber):
                self.sectype = type(x)
                self.value = None  # lazily expanded against a given length
                self._num = x
            elif isinstance(x, (list, tuple)):
                # unit vector given as a plain list: infer the sectype
                # (reference seclists.py:391-397 via seclist)
                xs = seclist(x)
                self.sectype = xs.sectype
                self.value = list(xs)
            else:
                raise TypeError('secindex expects unit vector or secure number')
        self.offset = offset

    @classmethod
    def _from_number(cls, a, n):
        """Unit vector of length n from secure number a."""
        u = runtime.unit_vector(a, n)
        ix = cls(u, sectype=type(a))
        return ix

    def __add__(self, other):
        if isinstance(other, int):
            return secindex(self, offset=other)
        if isinstance(other, secindex):
            # index addition via unit-vector convolution (reference
            # seclists.py:401-409): recover numeric indices, re-expand
            sv, ov = self.value, other.value
            m, n = len(sv), len(ov)
            i = runtime.sum([sv[k] * k for k in range(1, m)]) if m > 1 \
                else self.sectype(0)
            j = runtime.sum([ov[k] * k for k in range(1, n)]) if n > 1 \
                else other.sectype(0)
            k = runtime.unit_vector(i + j, m + n - 1)
            return secindex(k, sectype=self.sectype,
                            offset=self.offset + other.offset)
        return NotImplemented

    __radd__ = __add__

    @staticmethod
    def random(sectype, length, offset=0):
        """Uniformly random secure index over the given range (reference
        seclists.py:422)."""
        from mpyc_tpu.random import random_unit_vector
        return secindex(random_unit_vector(sectype, length),
                        sectype=sectype, offset=offset)


def _unit(i, n):
    """Unit vector (list of secure bits) for index i over length n."""
    if isinstance(i, secindex):
        if i.value:
            u = list(i.value)
            off = i.offset
        else:
            u = runtime.unit_vector(i._num, n - i.offset)
            off = i.offset
        u = [type(u[0])(0)] * off + u
        u += [type(u[0])(0)] * (n - len(u))
        return u
    if isinstance(i, sectypes.SecureNumber):
        return runtime.unit_vector(i, n)
    if isinstance(i, (list, tuple)):
        # unary (unit-vector) index given directly (reference
        # seclists.py:89-92)
        u = list(i)
        if len(u) != n:
            raise IndexError('inconsistent index length')
        return u
    raise TypeError('secret index expected')


class seclist(list):
    """List of secure numbers with oblivious secret-index access."""

    sectype = None

    def __init__(self, x=(), sectype=None):
        parent = []
        for a in x:
            parent.append(a)
        super().__init__(parent)
        for a in self:
            if isinstance(a, sectypes.SecureObject):
                if sectype is None:
                    sectype = type(a)
                elif not isinstance(a, sectype):
                    raise TypeError('inconsistent sectypes')
        if sectype is None:
            raise ValueError('sectype missing')
        self.sectype = sectype
        for j, a in enumerate(self):
            if not isinstance(a, sectypes.SecureObject):
                super().__setitem__(j, sectype(a))

    def _coerce_value(self, value):
        if isinstance(value, sectypes.SecureObject):
            return value
        return self.sectype(value)

    # -- reads --------------------------------------------------------------

    def __getitem__(self, key):
        if isinstance(key, (int, slice)):
            r = super().__getitem__(key)
            if isinstance(key, slice):
                return seclist(r, sectype=self.sectype)
            return r
        u = _unit(key, len(self))
        return runtime.in_prod(list(self), u)

    # -- writes -------------------------------------------------------------

    def __setitem__(self, key, value):
        if isinstance(key, (int, slice)):
            if isinstance(key, slice):
                if isinstance(value, seclist) and \
                        not issubclass(value.sectype, self.sectype):
                    raise TypeError('inconsistent sectypes')
                value = [self._coerce_value(v) for v in value]
            else:
                value = self._coerce_value(value)
            super().__setitem__(key, value)
            return
        value = self._coerce_value(value)
        u = _unit(key, len(self))
        x_u = runtime.in_prod(list(self), u)
        d = runtime.scalar_mul(value - x_u, u)
        for j in range(len(self)):
            super().__setitem__(j, self[j] + d[j])

    def append(self, value):
        super().append(self._coerce_value(value))

    def extend(self, values):
        for v in values:
            self.append(v)

    def insert(self, key, value):
        """Insert value before (possibly secret) index key."""
        value = self._coerce_value(value)
        if isinstance(key, int):
            super().insert(key, value)
            return
        n = len(self)
        u = _unit(key, n + 1)
        # prefix mask z_j = sum_{i<=j} u_i  (1 from the insertion point on)
        z = []
        acc = None
        for j in range(n + 1):
            acc = u[j] if acc is None else acc + u[j]
            z.append(acc)
        zero = self.sectype(0)
        old = list(self) + [zero]          # old[j], j in [0, n]
        prev = [zero] + list(self)         # old[j-1]
        new = []
        for j in range(n + 1):
            # before point: old[j]; at the point: value; after: old[j-1]
            v = old[j] + runtime.mul(z[j], prev[j] - old[j]) \
                + runtime.mul(u[j], value - prev[j])
            new.append(v)
        super().__init__(new)

    def delete(self, key):
        """Delete element at (possibly secret) index key."""
        if isinstance(key, (int, slice)):
            super().__delitem__(key)
            return
        n = len(self)
        u = _unit(key, n)
        # prefix mask: from the deletion point, take the next element
        z = []
        acc = None
        for j in range(n):
            acc = u[j] if acc is None else acc + u[j]
            z.append(acc)
        new = []
        for j in range(n - 1):
            new.append(runtime.if_else(z[j], self[j + 1], self[j]))
        super().__init__(new)

    def __delitem__(self, key):
        self.delete(key)

    def pop(self, key=-1):
        """Remove and return element at (possibly secret) index key."""
        if isinstance(key, int):
            return super().pop(key)
        r = self[key]
        self.delete(key)
        return r

    # -- misc ---------------------------------------------------------------

    def sort(self, key=None, reverse=False):
        if len(self) < 2:
            return
        x = runtime.sorted(list(self), key=key, reverse=reverse)
        super().__init__(x)

    def copy(self):
        """Shallow copy as a new seclist (reference seclists.py:282)."""
        return seclist(list(self), sectype=self.sectype)

    def count(self, value):
        """Secure count of occurrences of value."""
        value = self._coerce_value(value)
        return runtime.sum([runtime.eq(a, value) for a in self])

    def contains(self, item):
        """Secure 0/1 test whether item occurs in the list (reference
        seclists.py:296)."""
        return self.count(item) != 0

    def find(self, value):
        """Secure index of the first occurrence of value, or -1 if value
        is not present (reference seclists.py:304)."""
        if not self:
            return self.sectype(-1)
        value = self._coerce_value(value)
        return runtime.find(list(self), value, bits=False, e=-1)

    def remove(self, value):
        """Remove first occurrence of value; raise ValueError if value is
        not present (reference seclists.py:271)."""
        i = self.find(value)
        if runtime.eq_public(i, -1):
            raise ValueError('value is not in list')
        self.delete(i)

    def index(self, value):
        """Secure index of the first occurrence of value."""
        value = self._coerce_value(value)
        return runtime.indexOf(list(self), value, bits=False)

    def __contains__(self, item):
        """Not implemented: "item in self" is forced to a public bool by
        Python; use seclist.contains(self, item) for a secure result
        (reference seclists.py:288)."""
        raise NotImplementedError('use seclist.contains()')

    def __add__(self, other):
        if isinstance(other, seclist) and other.sectype != self.sectype:
            raise TypeError('inconsistent sectypes')
        out = seclist(self, sectype=self.sectype)
        out.extend(other)
        return out

    def __radd__(self, other):
        # keep "[...] + s" a seclist (reference seclists.py:189-190)
        return seclist(list(other) + list(self), self.sectype)

    def __iadd__(self, other):
        self.extend(other)
        return self

    def __mul__(self, other):
        return seclist(list(self) * other, self.sectype)

    __rmul__ = __mul__

    def __imul__(self, other):
        super().__init__(list(self) * other)
        return self

    def __lt__(self, other):
        """Lexicographic secure comparison of equal-length lists."""
        n = min(len(self), len(other))
        lt = None
        eq = None
        for j in range(n):
            a, b = self[j], other[j]
            b = self._coerce_value(b)
            l_j = runtime.lt(a, b)
            e_j = runtime.eq(a, b)
            if lt is None:
                lt, eq = l_j, e_j
            else:
                lt = lt + runtime.mul(eq, l_j)
                eq = runtime.mul(eq, e_j)
        if lt is None:  # one of the lists is empty
            lt, eq = self.sectype(0), self.sectype(1)
        if len(self) < len(other):
            lt = lt + eq
        return lt

    def __le__(self, other):
        # not (other < self), reference seclists.py:367-368
        o = other if isinstance(other, seclist) else \
            seclist(other, self.sectype)
        return 1 - o.__lt__(self)

    def __ge__(self, other):
        return 1 - self.__lt__(other)

    def __gt__(self, other):
        o = other if isinstance(other, seclist) else \
            seclist(other, self.sectype)
        return o.__lt__(self)

    def __eq__(self, other):
        if len(self) != len(other):
            return self.sectype(0)
        # empty lists compare equal as plain 1 (reference seclists.py:370-375
        # via runtime.all of an empty generator)
        return runtime.all([a == self._coerce_value(b)
                            for a, b in zip(self, other)])

    def __ne__(self, other):
        return 1 - self.__eq__(other)

    __hash__ = None
