"""R1CS circuit builder over BN254 Fr with Goldilocks-emulation gadgets and
an in-SNARK Poseidon2-Goldilocks permutation/sponge.

This is the statement layer of the Groth16 wrap (the role gnark circuits
play in the reference, groth16-framework/src/lib.rs + the
gnark-plonky2-verifier dependency): Goldilocks arithmetic is emulated in
Fr with witnessed quotient/remainder reductions and bit range checks, and
the Poseidon2 permutation is replayed exactly per the host golden model
(hash/poseidon2_host.py).  The first shipped statement recomputes the
Poseidon2 hash of the revelation public inputs IN-SNARK — the commitment
the TP2 transcript binds — replacing round 1's squaring-chain stand-in.

Everything here is prover-side circuit DEFINITION + witness: values are
computed eagerly while constraints are recorded; the native BN254 backend
(native/bn254.cc) consumes (matrices, witness) for setup/prove/verify.

Key representation choices:
  * Linear combinations are symbolic (additions and the Poseidon2 matmuls
    are FREE — folded into R1CS rows).
  * `LC.value` tracks the TRUE INTEGER value (not mod Fr), so magnitude
    bounds for the witnessed reductions are exact.
  * Inside the permutation every state element stays a FLAT lincomb over
    already-reduced wires with coefficients normalized mod P_GL, so
    magnitudes stay ~2^134 regardless of round depth (the internal matmul
    diagonal entries are full 64-bit values).
  * r < P is enforced via the structure of P = 2^64 - 2^32 + 1: a 64-bit
    r is >= P iff its high 32 bits are all ones AND its low 32 bits are
    nonzero — one AND-chain + one product row (cheaper than a second
    64-bit decomposition).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from mp2_tpu.field.goldilocks import P as P_GL
from mp2_tpu.hash.constants import M4, RATE, ROUNDS_F, ROUNDS_P, WIDTH, load_table

# BN254 scalar field
R_FR = 21888242871839275222246405745257275088548364400416034343698204186575808495617

_EXT_RC, _INT_RC, _INT_DIAG = load_table()


@dataclass
class LC:
    """Linear combination sum(coeff * wire) + const over Fr, with its TRUE
    integer witness value (coeffs canonical in [0, R_FR))."""

    terms: Dict[int, int]
    const: int
    value: int

    def __add__(self, other):
        if isinstance(other, int):
            return LC(dict(self.terms), self.const + other,
                      self.value + other)
        t = dict(self.terms)
        for w, c in other.terms.items():
            t[w] = t.get(w, 0) + c
        return LC(t, self.const + other.const, self.value + other.value)

    def scale(self, k: int) -> "LC":
        return LC({w: c * k for w, c in self.terms.items()},
                  self.const * k, self.value * k)


def _lc_zero() -> LC:
    return LC({}, 0, 0)


def _lc_sum(lcs: Sequence[LC]) -> LC:
    """Single-pass merge of many LCs (sum() via __add__ copies the
    accumulator dict per step — quadratic on wide lincombs)."""
    terms: Dict[int, int] = {}
    const = 0
    value = 0
    for lc in lcs:
        for w, c in lc.terms.items():
            terms[w] = terms.get(w, 0) + c
        const += lc.const
        value += lc.value
    return LC(terms, const, value)


def _lc_comb(pairs: Sequence[Tuple[int, LC]], const: int = 0) -> LC:
    """sum(k * lc) + const in one pass (fuses scale into the merge)."""
    terms: Dict[int, int] = {}
    c_acc = const
    v_acc = const
    for k, lc in pairs:
        for w, c in lc.terms.items():
            terms[w] = terms.get(w, 0) + k * c
        c_acc += k * lc.const
        v_acc += k * lc.value
    return LC(terms, c_acc, v_acc)


class SpillRows:
    """Disk-backed streaming row store for ~100M+-row statements (NEXT.md
    round-3 item 1): rows are packed into CSR fragments (per-row entry
    counts u32, wire ids i32, coefficient limbs u64x4) as they arrive and
    spilled to temp files every CHUNK rows, so the Python dict
    representation never accumulates — at the production wrapped-revelation
    shape the in-memory rows alone exceeded 130 GB RSS while the packed
    CSR is a few tens of GB of (evictable) page cache.

    Duck-types the list surface R1CS uses (`append`, `len`, iteration) and
    adds `finalize()` -> three (ptr, wire, coeff) memmap triples in exactly
    the layout `bn254_groth16_csr` consumes in place.  Iteration (for
    `check()`) replays spilled fragments back into dict rows.  The temp
    directory is removed when the object is collected."""

    CHUNK = 1 << 19  # rows per spill fragment (~tens of MB packed)

    def __init__(self, spill_dir: Optional[str] = None):
        import atexit
        import shutil
        import tempfile

        self.tmpdir = tempfile.mkdtemp(prefix="mp2_r1cs_", dir=spill_dir)
        # best-effort cleanup on interpreter exit: a production-shape run
        # spills ~60 GB, and a crashed/killed run otherwise leaves it on
        # disk (two stale runs filled the build box, r5)
        atexit.register(shutil.rmtree, self.tmpdir, True)
        self._fh = []  # per matrix: (counts, wires, coeffs) file handles
        for k in range(3):
            base = f"{self.tmpdir}/m{k}"
            self._fh.append((
                open(base + ".cnt", "wb"),
                open(base + ".wir", "wb"),
                open(base + ".coe", "wb"),
            ))
        self._buf: List[Tuple[Dict, Dict, Dict]] = []
        self._n_spilled = 0
        self._nnz = [0, 0, 0]
        self._final = None

    def append(self, row: Tuple[Dict, Dict, Dict]) -> None:
        assert self._final is None, "SpillRows already finalized"
        self._buf.append(row)
        if len(self._buf) >= self.CHUNK:
            self._flush()

    def __len__(self) -> int:
        return self._n_spilled + len(self._buf)

    def _flush(self) -> None:
        import numpy as np

        buf = self._buf
        if not buf:
            return
        MASK = 0xFFFFFFFFFFFFFFFF
        for k in range(3):
            cnt = np.empty(len(buf), dtype=np.uint32)
            for i, row in enumerate(buf):
                cnt[i] = len(row[k])
            # accumulate in int64/Python int: uint32 totals wrap past 2^32
            # nonzeros, exactly the 100M+-row scale this class targets
            nnz = int(cnt.sum(dtype=np.int64))
            wires = np.empty(nnz, dtype=np.int32)
            coeffs = np.empty((nnz, 4), dtype=np.uint64)
            pos = 0
            for row in buf:
                for wi, co in sorted(row[k].items()):
                    wires[pos] = wi
                    c = coeffs[pos]
                    c[0] = co & MASK
                    c[1] = (co >> 64) & MASK
                    c[2] = (co >> 128) & MASK
                    c[3] = (co >> 192) & MASK
                    pos += 1
            fc, fw, fo = self._fh[k]
            cnt.tofile(fc)
            wires.tofile(fw)
            coeffs.tofile(fo)
            self._nnz[k] += nnz
        self._n_spilled += len(buf)
        self._buf = []

    def __iter__(self):
        """Replay rows (spilled fragments first, then the live buffer) as
        (A, B, C) dict triples — the `check()` contract."""
        import numpy as np

        self._sync()
        n = self._n_spilled
        mats = []
        for k in range(3):
            base = f"{self.tmpdir}/m{k}"
            cnt = np.fromfile(base + ".cnt", dtype=np.uint32, count=n)
            mats.append((cnt, open(base + ".wir", "rb"),
                         open(base + ".coe", "rb")))
        try:
            for i in range(n):
                row = []
                for cnt, fw, fo in mats:
                    m = int(cnt[i])
                    wires = np.fromfile(fw, dtype=np.int32, count=m)
                    coeffs = np.fromfile(fo, dtype=np.uint64, count=4 * m)
                    d = {}
                    for j in range(m):
                        co = (int(coeffs[4 * j]) | int(coeffs[4 * j + 1]) << 64
                              | int(coeffs[4 * j + 2]) << 128
                              | int(coeffs[4 * j + 3]) << 192)
                        d[int(wires[j])] = co
                    row.append(d)
                yield tuple(row)
        finally:
            for _, fw, fo in mats:
                fw.close()
                fo.close()
        yield from self._buf

    def _sync(self) -> None:
        for fh in self._fh:
            for f in fh:
                if not f.closed:
                    f.flush()

    def snapshot(self):
        """Flush pending rows and return (ptr, wire, coeff) memmap triples
        over everything appended SO FAR, WITHOUT freezing the store: write
        handles stay open and further append()s are legal.  This is what
        check() uses, so a build-check-build-more workflow behaves the same
        in spill and non-spill mode (advisor r3, medium)."""
        assert self._final is None, "SpillRows already finalized"
        self._flush()
        self._sync()
        return self._views()

    def finalize(self):
        """Spill any pending rows, convert per-row counts to cumulative
        pointers (int64 memmap), and return the three (ptr, wire, coeff)
        triples as read-only memmaps over the spill files — zero-copy into
        `bn254_groth16_csr`.  Closes the write handles: the store is
        frozen afterwards (append() asserts).  Idempotent."""
        if self._final is not None:
            return self._final
        self._flush()
        for fh in self._fh:
            for f in fh:
                f.close()
        self._final = self._views()
        return self._final

    def _views(self):
        """(ptr, wire, coeff) triples over the spilled fragments (counts
        converted to cumulative int64 pointers on the side)."""
        import numpy as np

        n = self._n_spilled
        out = []
        for k in range(3):
            base = f"{self.tmpdir}/m{k}"
            ptr = np.memmap(base + ".ptr", dtype=np.int64, mode="w+",
                            shape=(n + 1,))
            ptr[0] = 0
            total = 0
            STEP = 1 << 22
            with open(base + ".cnt", "rb") as fc:
                off = 0
                while off < n:
                    cnt = np.fromfile(fc, dtype=np.uint32,
                                      count=min(STEP, n - off))
                    np.cumsum(cnt, dtype=np.int64,
                              out=ptr[off + 1 : off + 1 + len(cnt)])
                    ptr[off + 1 : off + 1 + len(cnt)] += total
                    total += int(cnt.sum(dtype=np.int64))
                    off += len(cnt)
            assert total == self._nnz[k]
            wires = np.memmap(base + ".wir", dtype=np.int32, mode="r",
                              shape=(total,)) if total else np.empty(
                                  0, dtype=np.int32)
            coeffs = np.memmap(base + ".coe", dtype=np.uint64, mode="r",
                               shape=(total, 4)) if total else np.empty(
                                   (0, 4), dtype=np.uint64)
            out.append((ptr, wires, coeffs))
        return tuple(out)

    def __del__(self):
        # tolerate interpreter teardown, where module globals (import
        # machinery included) may already be None
        try:
            import shutil

            for fh in self._fh:
                for f in fh:
                    if not f.closed:
                        f.close()
            shutil.rmtree(self.tmpdir, ignore_errors=True)
        except Exception:
            pass


class _Witness(list):
    """Witness vector that flags in-place mutation (tamper-style
    `witness[w] = v`), so the pack_witness cache can't go stale: appends
    are covered by the length check, everything else sets `dirty`."""

    def __init__(self, *a):
        super().__init__(*a)
        self.dirty = False

    def __setitem__(self, i, v):
        self.dirty = True
        super().__setitem__(i, v)


class R1CS:
    def __init__(self, spill_dir: Optional[str] = None, spill: bool = False):
        """spill=True (or a spill_dir) streams rows to disk-backed CSR
        fragments instead of accumulating Python dicts — required for the
        production-shape wrapped-revelation statement (>130 GB RSS
        otherwise)."""
        self.witness: List[int] = _Witness([1])  # wire 0 = constant 1
        self.num_public = 0  # wires 1..num_public are public
        self._packed_wit = None  # pack_witness cache (append-only witness)
        if spill or spill_dir is not None:
            self.rows = SpillRows(spill_dir)
        else:
            self.rows: List[Tuple[Dict, Dict, Dict]] = []  # (A, B, C) sparse

    # ------------------------------------------------------------ wires
    def new_wire(self, value: int) -> int:
        self.witness.append(value % R_FR)
        return len(self.witness) - 1

    def lc(self, wire: int) -> LC:
        return LC({wire: 1}, 0, self.witness[wire])

    def const_lc(self, v: int) -> LC:
        return LC({}, v, v)

    def public_input(self, value: int) -> LC:
        w = self.new_wire(value)
        assert w == self.num_public + 1, "publics must be declared first"
        self.num_public += 1
        return self.lc(w)

    def normalize_gl(self, x: LC) -> LC:
        """Reduce coefficients/const mod P_GL and recompute the true value
        (pure symbol manipulation — no constraints).  Changes the value by
        a multiple of P_GL only."""
        terms = {w: c % P_GL for w, c in x.terms.items()}
        terms = {w: c for w, c in terms.items() if c}
        const = x.const % P_GL
        value = const + sum(c * self.witness[w] for w, c in terms.items())
        return LC(terms, const, value)

    # ------------------------------------------------------- constraints
    @staticmethod
    def _row(lc: LC) -> Dict[int, int]:
        d = {w: c % R_FR for w, c in lc.terms.items()}
        if lc.const % R_FR:
            d[0] = (d.get(0, 0) + lc.const) % R_FR
        return {w: c for w, c in d.items() if c}

    def enforce(self, a: LC, b: LC, c: LC) -> None:
        assert (a.value % R_FR) * (b.value % R_FR) % R_FR == c.value % R_FR, (
            "unsatisfied row"
        )
        self.rows.append((self._row(a), self._row(b), self._row(c)))

    def enforce_zero(self, a: LC) -> None:
        self.enforce(a, self.const_lc(1), self.const_lc(0))

    def mul(self, a: LC, b: LC) -> LC:
        w = self.new_wire((a.value % R_FR) * (b.value % R_FR) % R_FR)
        out = self.lc(w)
        self.enforce(a, b, out)
        return out

    def bit(self, value: int) -> LC:
        assert value in (0, 1)
        w = self.new_wire(value)
        l = self.lc(w)
        self.enforce(l, l + (-1), self.const_lc(0))
        return l

    def bits_of(self, value: int, n: int) -> Tuple[LC, List[LC]]:
        """n fresh bit wires + their weighted sum as an LC (no sum wire).

        Hot path: wires, booleanity rows and the weighted-sum LC are built
        directly (the generic bit()/__add__ route copies the accumulator
        dict per bit — quadratic in n)."""
        assert 0 <= value < (1 << n), "value out of declared bit range"
        wit = self.witness
        rows = self.rows
        wbase = len(wit)
        bits: List[LC] = []
        acc_terms: Dict[int, int] = {}
        for i in range(n):
            v = (value >> i) & 1
            w = wbase + i
            wit.append(v)
            # booleanity: w * (w - 1) == 0
            rows.append(({w: 1}, {w: 1, 0: R_FR - 1}, {}))
            bits.append(LC({w: 1}, 0, v))
            acc_terms[w] = 1 << i
        return LC(acc_terms, 0, value), bits

    # -------------------------------------------------- Goldilocks gadgets
    def _enforce_lt_p(self, r_bits: List[LC]) -> None:
        """64-bit r < P via P's structure: reject (high 32 all ones AND
        low 32 nonzero)."""
        hi_and = r_bits[32]
        for b in r_bits[33:64]:
            hi_and = self.mul(hi_and, b)
        lo_sum = _lc_comb([(1 << i, b) for i, b in enumerate(r_bits[:32])])
        self.enforce(hi_and, lo_sum, self.const_lc(0))

    def gl_reduce(self, x: LC, in_bits: int, canonical: bool = True) -> LC:
        """x (TRUE value in [0, 2^in_bits)) -> x mod P_GL.  Witnessed q, r
        with x = q*P + r, q range-checked, r 64-bit.

        canonical=False skips the r < P check: the result is then SOME
        64-bit representative of x mod P (the honest witness is always the
        canonical one, but a prover may add P when r < 2^64 - P).  That is
        sound wherever only congruence mod P is consumed — `connect`
        enforces congruence with a witnessed quotient and `decompose_bits`
        re-reduces canonically first — so intermediate sbox chains take the
        cheap form and skip the 32-row AND-chain."""
        xv = x.value
        assert 0 <= xv < (1 << in_bits), "gl_reduce: value exceeds bits"
        q, r = divmod(xv, P_GL)
        q_bits = max(in_bits - 63, 1)
        q_lc, _ = self.bits_of(q, q_bits)
        r_lc, rb = self.bits_of(r, 64)
        if canonical:
            self._enforce_lt_p(rb)
        self.enforce_zero(_lc_comb([(1, x), (-P_GL, q_lc), (-1, r_lc)]))
        return r_lc

    def gl_input_check(self, x: LC) -> None:
        """Bind a witnessed input to canonical Goldilocks: 64-bit + < P."""
        acc, bits = self.bits_of(x.value, 64)
        self.enforce_zero(_lc_comb([(1, x), (-1, acc)]))
        self._enforce_lt_p(bits)

    def mul_true(self, a: LC, b: LC) -> LC:
        """One multiplication row; result LC carries the TRUE integer
        product (caller tracks magnitude and reduces when needed)."""
        raw = self.mul(a, b)
        return LC(raw.terms, raw.const, a.value * b.value)

    def gl_mul(self, a: LC, b: LC, bits: int = 128) -> LC:
        return self.gl_reduce(self.mul_true(a, b), bits)

    # --------------------------------------------------------- Poseidon2
    def _sbox(self, x: LC, in_bits: int) -> LC:
        """x^7 mod P with LAZY reduction: unreduced 192-bit intermediates
        are safe in Fr (~2^254), so only x^3 and x^7 pay a reduction —
        2 reductions instead of 4 per sbox.  All reductions are
        NON-canonical (64-bit representatives): the permutation only needs
        congruence mod P internally, and the final outputs are
        canonicalized once in poseidon2_permute."""
        if in_bits > 64:
            x = self.gl_reduce(x, in_bits, canonical=False)
        x2 = self.mul_true(x, x)          # < 2^128
        x3 = self.gl_reduce(self.mul_true(x2, x), 192, canonical=False)
        x6 = self.mul_true(x3, x3)        # < 2^128
        return self.gl_reduce(self.mul_true(x6, x), 192, canonical=False)

    @staticmethod
    def _ext_linear(state: List[LC]) -> List[LC]:
        chunks = []
        for i in range(0, WIDTH, 4):
            c = state[i : i + 4]
            chunks.append([
                _lc_comb([(M4[i2][j], c[j]) for j in range(4)])
                for i2 in range(4)
            ])
        total = [_lc_sum([ch[i2] for ch in chunks]) for i2 in range(4)]
        out: List[LC] = []
        for ch in chunks:
            out.extend(ch[i2] + total[i2] for i2 in range(4))
        return out

    def _int_linear(self, state: List[LC]) -> List[LC]:
        s = _lc_sum(state)
        out = [
            _lc_sum([s, state[i].scale(_INT_DIAG[i] - 1)])
            for i in range(WIDTH)
        ]
        # normalize: flat coefficients mod P keep magnitudes ~2^134
        # regardless of round depth
        return [self.normalize_gl(x) for x in out]

    def poseidon2_permute(self, state: List[LC]) -> List[LC]:
        """Mirrors poseidon2_host.permute; inputs must be 64-bit-bounded
        representatives mod P (canonical not required — the magnitude
        analysis below only uses < 2^64).  Outputs are 64-bit
        representatives (canonical in the honest witness; consumers
        compare via congruence or exact Fr equality, both of which are
        sound against a +P shift)."""
        # magnitude bound of a normalized flat lincomb: coefficients and
        # wire values < P => each term < P^2 < 2^128; the internal-round
        # lincombs span <= 12 + 22 wires + const, so value < 2^134
        # ext_linear bound: chunk < 16P (max M4 row sum), total < 48P,
        # out < 64P < 2^70; + round constant stays < 2^71
        NORM_BITS = 135
        EXT_BITS = 71
        half = ROUNDS_F // 2
        st = self._ext_linear(state)
        for r in range(half):
            st = [x + rc for x, rc in zip(st, _EXT_RC[r])]
            st = [self._sbox(x, EXT_BITS) for x in st]
            st = self._ext_linear(st)
        for r in range(ROUNDS_P):
            s0 = self._sbox(st[0] + _INT_RC[r], NORM_BITS)
            st = self._int_linear([s0] + st[1:])
        first = True
        for r in range(half, ROUNDS_F):
            st = [x + rc for x, rc in zip(st, _EXT_RC[r])]
            st = [self._sbox(x, NORM_BITS if first else EXT_BITS) for x in st]
            st = self._ext_linear(st)
            first = False
        return [self.gl_reduce(x, EXT_BITS, canonical=False) for x in st]

    # ------------------------------------------------- template stamping
    def poseidon2_permute_stamped(self, state: List[LC]) -> List[LC]:
        """Same constraints as poseidon2_permute, but instantiated from a
        RECORDED single-permutation template instead of re-deriving every
        lincomb: the permutation's constraint structure is input-
        independent (coefficients are round constants / matrix entries),
        so one template stamps every instance by wire-offset remapping,
        with witness values replayed from a compact op program.  Adds 12
        input-compression wires+rows per call (inputs must be single
        wires for the template map)."""
        tpl = _perm_template()
        # compress each input LC to a single wire (equality row)
        in_wires: List[int] = []
        for lc in state:
            if len(lc.terms) == 1 and lc.const == 0:
                (w, c), = lc.terms.items()
                if c == 1:
                    in_wires.append(w)
                    continue
            w = self.new_wire(lc.value % R_FR)
            self.enforce_zero(_lc_comb([(1, lc), (-1, self.lc(w))]))
            in_wires.append(w)
        off = len(self.witness)
        n_in = len(in_wires)
        # flat template-wire -> instance-wire map (list indexing beats a
        # per-term function call on the 58k-row remap)
        wmap = [0] + in_wires + list(
            range(off, off + tpl.n_wires - n_in - 1)
        )
        wit = self.witness

        def ev(terms: Dict[int, int], const: int) -> int:
            v = const
            for w, c in terms.items():
                v += c * wit[wmap[w]]
            return v

        for op in tpl.prog:
            if op[0] == "mul":
                _, at, ac, bt, bc = op
                wit.append((ev(at, ac) % R_FR) * (ev(bt, bc) % R_FR) % R_FR)
            else:  # ("reduce", x_terms, x_const, q_bits)
                _, xt, xc, q_bits = op
                q, r = divmod(ev(xt, xc), P_GL)
                for i in range(q_bits):
                    wit.append((q >> i) & 1)
                for i in range(64):
                    wit.append((r >> i) & 1)
        rows = self.rows
        for A, B, C in tpl.rows:
            rows.append((
                {wmap[w]: c for w, c in A.items()},
                {wmap[w]: c for w, c in B.items()},
                {wmap[w]: c for w, c in C.items()},
            ))
        return [
            LC({wmap[w]: c for w, c in o.terms.items()}, o.const,
               ev(o.terms, o.const))
            for o in tpl.outs
        ]

    def poseidon2_hash_no_pad(self, inputs: List[LC], num_outputs: int = 4
                              ) -> List[LC]:
        """Overwrite-mode sponge (hash_n_to_m_no_pad semantics)."""
        state = [self.const_lc(0) for _ in range(WIDTH)]
        for i in range(0, len(inputs), RATE):
            chunk = inputs[i : i + RATE]
            state[: len(chunk)] = list(chunk)
            state = self.poseidon2_permute(state)
        return state[:num_outputs]

    # ------------------------------------------------------------- export
    def check(self) -> bool:
        if isinstance(self.rows, SpillRows):
            ok = self._check_native()
            if ok is not None:
                return ok
        w = self.witness
        for a, b, c in self.rows:
            av = sum(co * w[wi] for wi, co in a.items()) % R_FR
            bv = sum(co * w[wi] for wi, co in b.items()) % R_FR
            cv = sum(co * w[wi] for wi, co in c.items()) % R_FR
            if av * bv % R_FR != cv:
                return False
        return True

    def _check_native(self) -> Optional[bool]:
        """Threaded native satisfaction check over the finalized spill
        memmaps (the Python per-row replay at 100M rows costs hours);
        None when the native backend is unavailable."""
        from mp2_tpu.groth16 import _check_csr_native

        return _check_csr_native(self)

    def pack_witness(self):
        """Witness as (n, 4) canonical u64 limbs (native intake layout).

        Cached per witness length (the witness is append-only; values are
        never mutated in place), so check() followed by
        to_arrays_consuming() packs the 100M+-entry vector once, not twice
        (advisor r3).  The overwhelming majority of wires are bits or
        64-bit-reduced values, so the small-value fast path skips three
        shifts+masks per entry."""
        import numpy as np

        n = len(self.witness)
        if (self._packed_wit is not None and len(self._packed_wit) == n
                and not getattr(self.witness, "dirty", True)):
            return self._packed_wit
        if isinstance(self.witness, _Witness):
            self.witness.dirty = False
        MASK = 0xFFFFFFFFFFFFFFFF
        wl = np.zeros((n, 4), dtype=np.uint64)
        for i, v in enumerate(self.witness):
            if v < 0x10000000000000000:
                wl[i, 0] = v
            else:
                wl[i, 0] = v & MASK
                wl[i, 1] = (v >> 64) & MASK
                wl[i, 2] = (v >> 128) & MASK
                wl[i, 3] = (v >> 192) & MASK
        self._packed_wit = wl
        return wl

    def to_arrays_consuming(self):
        """Memory-frugal variant of to_arrays for ~100M-row statements:
        one pass over the rows, emitting all three CSR matrices into
        preallocated numpy buffers and FREEING each Python row as it is
        consumed (the Python dict representation is several times larger
        than the packed arrays).  The R1CS rows are GONE afterwards —
        only the arrays remain.  Returns the same tuple as to_arrays.

        In spill mode the rows are already packed on disk: finalize the
        fragments and return memmap-backed triples (RSS stays bounded by
        the witness limbs)."""
        import numpy as np

        if isinstance(self.rows, SpillRows):
            a, b, c = self.rows.finalize()
            return a, b, c, self.pack_witness()

        n = len(self.rows)
        nnz = [0, 0, 0]
        for row in self.rows:
            for k in range(3):
                nnz[k] += len(row[k])
        ptrs = [np.zeros(n + 1, dtype=np.int64) for _ in range(3)]
        wires = [np.empty(nnz[k], dtype=np.int32) for k in range(3)]
        coeffs = [np.empty((nnz[k], 4), dtype=np.uint64) for k in range(3)]
        pos = [0, 0, 0]
        MASK = 0xFFFFFFFFFFFFFFFF
        for i in range(n):
            row = self.rows[i]
            for k in range(3):
                pk = pos[k]
                for wi, co in sorted(row[k].items()):
                    wires[k][pk] = wi
                    c = coeffs[k][pk]
                    c[0] = co & MASK
                    c[1] = (co >> 64) & MASK
                    c[2] = (co >> 128) & MASK
                    c[3] = (co >> 192) & MASK
                    pk += 1
                pos[k] = pk
                ptrs[k][i + 1] = pk
            self.rows[i] = None  # free as we go
        self.rows.clear()
        wl = self.pack_witness()
        return (
            (ptrs[0], wires[0], coeffs[0]),
            (ptrs[1], wires[1], coeffs[1]),
            (ptrs[2], wires[2], coeffs[2]),
            wl,
        )

    def to_arrays(self):
        """Flatten to (ptr, wire, coeff-limb) arrays per matrix + witness
        limbs — the native bn254 generic intake format."""
        import numpy as np

        def pack(idx):
            ptr = np.zeros(len(self.rows) + 1, dtype=np.int64)
            wires: List[int] = []
            coeffs: List[int] = []
            for i, row in enumerate(self.rows):
                for wi, co in sorted(row[idx].items()):
                    wires.append(wi)
                    coeffs.extend(
                        (co >> (64 * k)) & 0xFFFFFFFFFFFFFFFF
                        for k in range(4)
                    )
                ptr[i + 1] = len(wires)
            return (
                ptr,
                np.asarray(wires, dtype=np.int32),
                np.asarray(coeffs, dtype=np.uint64).reshape(-1, 4),
            )

        wl = []
        for v in self.witness:
            wl.extend((v >> (64 * k)) & 0xFFFFFFFFFFFFFFFF for k in range(4))
        import numpy as np

        return (
            pack(0), pack(1), pack(2),
            np.asarray(wl, dtype=np.uint64).reshape(-1, 4),
        )


class _PermTemplate:
    """One recorded Poseidon2 permutation: rows over template wire ids
    (0 = const 1, 1..12 = inputs, 13.. = internals), output LCs, and the
    ordered witness program (mul products and divmod bit fills)."""

    def __init__(self, rows, outs, prog, n_wires):
        self.rows = rows
        self.outs = outs
        self.prog = prog
        self.n_wires = n_wires


class _Recorder(R1CS):
    def __init__(self):
        super().__init__()
        self.prog: List[tuple] = []

    def mul(self, a: LC, b: LC) -> LC:
        self.prog.append(("mul", dict(a.terms), a.const,
                          dict(b.terms), b.const))
        return super().mul(a, b)

    def gl_reduce(self, x: LC, in_bits: int, canonical: bool = True) -> LC:
        self.prog.append(
            ("reduce", dict(x.terms), x.const, max(in_bits - 63, 1))
        )
        return super().gl_reduce(x, in_bits, canonical)


_PERM_TEMPLATE: Optional[_PermTemplate] = None


def _perm_template() -> _PermTemplate:
    global _PERM_TEMPLATE
    if _PERM_TEMPLATE is None:
        t = _Recorder()
        ins = [t.new_wire(0) for _ in range(WIDTH)]
        outs = t.poseidon2_permute([t.lc(w) for w in ins])
        _PERM_TEMPLATE = _PermTemplate(t.rows, outs, t.prog, len(t.witness))
    return _PERM_TEMPLATE


def build_pi_binding_circuit(pi_values: Sequence[int]) -> Tuple[R1CS, List[int]]:
    """The wrap statement: public = the Goldilocks revelation PIs followed
    by their Poseidon2 hash (4 limbs); the circuit recomputes the hash
    in-SNARK and pins it.  Returns (r1cs, expected hash limbs)."""
    from mp2_tpu.hash import poseidon2_host as p2h

    r = R1CS()
    vals = [int(v) % P_GL for v in pi_values]
    want = p2h.hash_no_pad(vals)
    ins = [r.public_input(v) for v in vals]
    outs = [r.public_input(int(h)) for h in want]
    for l in ins:
        r.gl_input_check(l)
    got = r.poseidon2_hash_no_pad(ins)
    for g, o in zip(got, outs):
        r.enforce_zero(g + o.scale(-1))
    return r, [int(h) for h in want]
