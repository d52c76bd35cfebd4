"""BumbleBee-style ciphertext-plaintext matrix multiplication helper.

TPU-native rebuild of reference src/app/matmul.{h,cu} (1209 LoC).  The
packing scheme (identical layout so serialized positions match the
reference's test expectations):

  blocks (bb, ib, ob) with bb * ib * ob <= n chosen by a cost-model search;
  input poly  [di][dj]:  coeff[(i-li)*ib*ob + (j-lj)]           = x[i, j]
  weight poly [dj][dk]:  coeff[(k-lk)*ib + ib-1-(j-lj)]         = w[j, k]
  product:    coeff[(i-li)*ib*ob + (k-lk)*ib + ib-1]            = sum_j x w

so one multiply_plain + accumulate over input chunks computes a whole
(bb x ob) output tile.  pack_outputs compresses the output tiles ~ib x via
pack_rlwe_ciphertexts (Chen et al. 2020), shifting the payload offset ib-1
to 0 with the inherent shift 2n - (ib-1).

Objectives (ref: matmul.h:18): EncryptLeft (x encrypted, w plain),
EncryptRight (w encrypted, x plain), Crossed (both encrypted).
"""

from __future__ import annotations

import enum

import numpy as np

from .cipher2d import Plain2d, Cipher2d
from ..core.encryptor import Encryptor
from ..core.decryptor import Decryptor
from ..core.evaluator import Evaluator
from ..core.keys import GaloisKeys
from ..core.params import SchemeType


def ceil_div(a: int, b: int) -> int:
    return -(-a // b)


class MatmulObjective(enum.IntEnum):
    EncryptLeft = 0
    EncryptRight = 1
    Crossed = 2


class MatmulHelper:
    def __init__(self, batch_size: int, input_dims: int, output_dims: int,
                 slot_count: int,
                 objective: MatmulObjective = MatmulObjective.EncryptLeft,
                 pack_lwe: bool = True):
        self.batch_size = batch_size
        self.input_dims = input_dims
        self.output_dims = output_dims
        self.slot_count = slot_count
        self.objective = MatmulObjective(objective)
        self.pack_lwe = pack_lwe
        self.batch_block = 0
        self.input_block = 0
        self.output_block = 0
        self._determine_block()

    # ------------------------------------------------------------------
    def _determine_block(self):
        """Cost-model search over block sizes (ref: matmul.cu:101-161;
        the pack_lwe variant pins input_block near slot_count^(1/3))."""
        b_best = i_best = o_best = 0
        c_best = 1 << 62
        B, I, O, n = self.batch_size, self.input_dims, self.output_dims, self.slot_count
        obj = self.objective
        if not self.pack_lwe:
            for b in range(B, 0, -1):
                bc = ceil_div(B, b)
                if b >= n or bc * 2 > c_best:
                    continue
                for i in range(1, n // b):
                    o = min(n // b // i, O)
                    if i > I or o < 1:
                        continue
                    if obj == MatmulObjective.EncryptLeft:
                        c = bc * (ceil_div(I, i) + ceil_div(O, o))
                    elif obj == MatmulObjective.EncryptRight:
                        c = (bc + ceil_div(I, i)) * ceil_div(O, o)
                    else:
                        c = bc * I + (bc + ceil_div(I, i)) * ceil_div(O, o)
                    if c < c_best:
                        b_best, i_best, o_best, c_best = b, i, o, c
        else:
            sqrtn = n ** 0.33
            i = 1
            while i * 2 < sqrtn:
                i *= 2
            if i > I:
                i = 1
                while i < I:
                    i *= 2
            for b in range(1, B + 1):
                bc = ceil_div(B, b)
                if b > n:
                    continue
                o = min(n // b // i, O)
                if o < 1:
                    continue
                if obj == MatmulObjective.EncryptLeft:
                    c = bc * ceil_div(I, i) + ceil_div(bc * ceil_div(O, o), i)
                elif obj == MatmulObjective.EncryptRight:
                    c = ceil_div(O, o) * ceil_div(I, i) + ceil_div(bc * ceil_div(O, o), i)
                else:
                    c = (bc * ceil_div(I, i) + ceil_div(O, o) * ceil_div(I, i)
                         + ceil_div(bc * ceil_div(O, o), i))
                if c < c_best:
                    b_best, i_best, o_best, c_best = b, i, o, c
        if b_best == 0:
            raise ValueError("[MatmulHelper] no valid block decomposition")
        self.batch_block, self.input_block, self.output_block = b_best, i_best, o_best

    # ------------------------------------------------------------------
    # encoding (ref: matmul.cu encode_weights / encode_inputs)
    # ------------------------------------------------------------------
    def encode_weights(self, adapter, weights) -> Plain2d:
        """weights: (input_dims, output_dims) array -> Plain2d of blocks."""
        w = np.asarray(weights)
        ib, ob = self.input_block, self.output_block
        rows = []
        for lj in range(0, self.input_dims, ib):
            uj = min(lj + ib, self.input_dims)
            row = []
            for lk in range(0, self.output_dims, ob):
                uk = min(lk + ob, self.output_dims)
                vec = np.zeros(ib * ob, dtype=w.dtype)
                for k in range(lk, uk):
                    for j in range(lj, uj):
                        vec[(k - lk) * ib + ib - 1 - (j - lj)] = w[j, k]
                row.append(adapter.encode_for_plain(vec))
            rows.append(row)
        return Plain2d(rows)

    def encode_weights_for_cipher(self, adapter, weights) -> Plain2d:
        w = np.asarray(weights)
        ib, ob = self.input_block, self.output_block
        rows = []
        for lj in range(0, self.input_dims, ib):
            uj = min(lj + ib, self.input_dims)
            row = []
            for lk in range(0, self.output_dims, ob):
                uk = min(lk + ob, self.output_dims)
                vec = np.zeros(ib * ob, dtype=w.dtype)
                for k in range(lk, uk):
                    for j in range(lj, uj):
                        vec[(k - lk) * ib + ib - 1 - (j - lj)] = w[j, k]
                row.append(adapter.encode_for_cipher(vec))
            rows.append(row)
        return Plain2d(rows)

    def encode_inputs(self, adapter, inputs, for_cipher: bool = True) -> Plain2d:
        """inputs: (batch_size, input_dims) array -> Plain2d of blocks."""
        x = np.asarray(inputs)
        bb, ib, ob = self.batch_block, self.input_block, self.output_block
        rows = []
        for li in range(0, self.batch_size, bb):
            ui = min(li + bb, self.batch_size)
            row = []
            for lj in range(0, self.input_dims, ib):
                uj = min(lj + ib, self.input_dims)
                vec = np.zeros(self.slot_count, dtype=x.dtype)
                for i in range(li, ui):
                    for j in range(lj, uj):
                        vec[(i - li) * ib * ob + (j - lj)] = x[i, j]
                row.append(adapter.encode_for_cipher(vec) if for_cipher
                           else adapter.encode_for_plain(vec))
            rows.append(row)
        return Plain2d(rows)

    def encrypt_inputs(self, encryptor: Encryptor, adapter, inputs) -> Cipher2d:
        return self.encode_inputs(adapter, inputs, True).encrypt_symmetric(encryptor)

    def encrypt_weights(self, encryptor: Encryptor, adapter, weights) -> Cipher2d:
        return self.encode_weights_for_cipher(adapter, weights).encrypt_symmetric(encryptor)

    # ------------------------------------------------------------------
    # multiplication (ref: matmul.cu:326 matmul / matmul_cipher / _reverse)
    # ------------------------------------------------------------------
    def matmul(self, evaluator: Evaluator, a: Cipher2d, w: Plain2d,
               mesh=None) -> Cipher2d:
        """One fused kernel for the whole block contraction: every input
        block is NTT'd once and all multiply-accumulates run as a single
        batched pass (ref: matmul.cu:326 matmul over batched
        multiply_plain_accumulate kernels).  mesh: optional ('data', 'limb')
        jax.sharding.Mesh — the multi-device matmul of the reference's
        scripts/test_matmul.sh --multiple-devices, with block rows sharded
        over 'data' and RNS limbs over 'limb'."""
        bs = ceil_div(self.batch_size, self.batch_block)
        os_ = ceil_div(self.output_dims, self.output_block)
        is_ = ceil_div(self.input_dims, self.input_block)
        cts = [[a[b][i] for i in range(is_)] for b in range(bs)]
        pls = [[w[i][j] for j in range(os_)] for i in range(is_)]
        return Cipher2d(evaluator.multiply_plain_contract(cts, pls, mesh=mesh))

    def matmul_fly(self, evaluator: Evaluator, adapter, a: Cipher2d,
                   weights) -> Cipher2d:
        """matmul with on-the-fly weight encoding: each weight block is
        encoded, used, and dropped — peak memory holds one encoded block
        instead of the whole matrix (ref: matmul.cu matmul_fly)."""
        w = np.asarray(weights)
        ib, ob = self.input_block, self.output_block
        bs = ceil_div(self.batch_size, self.batch_block)
        os_ = ceil_div(self.output_dims, self.output_block)
        ret = [[None] * os_ for _ in range(bs)]
        for i, lj in enumerate(range(0, self.input_dims, ib)):
            uj = min(lj + ib, self.input_dims)
            for j, lk in enumerate(range(0, self.output_dims, ob)):
                uk = min(lk + ob, self.output_dims)
                vec = np.zeros(ib * ob, dtype=w.dtype)
                for k in range(lk, uk):
                    for jj in range(lj, uj):
                        vec[(k - lk) * ib + ib - 1 - (jj - lj)] = w[jj, k]
                pt = adapter.encode_for_plain(vec)
                for b in range(bs):
                    prod = evaluator.multiply_plain(a[b][i], pt)
                    ret[b][j] = (prod if ret[b][j] is None
                                 else evaluator.add(ret[b][j], prod))
        return Cipher2d(ret)

    def matmul_reverse(self, evaluator: Evaluator, a: Plain2d, w: Cipher2d) -> Cipher2d:
        """pt-ct matmul through the same fused contraction, with the roles
        transposed: out[b][j] = sum_i w[i][j] * a[b][i] = contract(w^T, a^T)^T
        (ref: matmul.cu matmul_reverse)."""
        bs = ceil_div(self.batch_size, self.batch_block)
        os_ = ceil_div(self.output_dims, self.output_block)
        is_ = ceil_div(self.input_dims, self.input_block)
        cts = [[w[i][j] for i in range(is_)] for j in range(os_)]
        pls = [[a[b][i] for b in range(bs)] for i in range(is_)]
        out = evaluator.multiply_plain_contract(cts, pls)  # (os_, bs)
        return Cipher2d([[out[j][b] for j in range(os_)] for b in range(bs)])

    def matmul_cipher(self, evaluator: Evaluator, a: Cipher2d, w: Cipher2d) -> Cipher2d:
        bs = ceil_div(self.batch_size, self.batch_block)
        os_ = ceil_div(self.output_dims, self.output_block)
        is_ = ceil_div(self.input_dims, self.input_block)
        ret = [[None] * os_ for _ in range(bs)]
        for b in range(bs):
            for i in range(is_):
                for j in range(os_):
                    prod = evaluator.multiply(a[b][i], w[i][j])
                    ret[b][j] = prod if ret[b][j] is None else evaluator.add(ret[b][j], prod)
        return Cipher2d(ret)

    # ------------------------------------------------------------------
    # outputs (ref: matmul.cu encode_outputs / decrypt_outputs / pack_outputs)
    # ------------------------------------------------------------------
    def _out_pos(self, i, j, li, lj):
        ib, ob = self.input_block, self.output_block
        return (i - li) * ib * ob + (j - lj) * ib + ib - 1

    def encode_outputs(self, adapter, outputs) -> Plain2d:
        """Encode a plain bias/output matrix in the product layout."""
        y = np.asarray(outputs)
        bb, ob, ib = self.batch_block, self.output_block, self.input_block
        if not self.pack_lwe:
            rows = []
            for li in range(0, self.batch_size, bb):
                ui = min(li + bb, self.batch_size)
                row = []
                for lj in range(0, self.output_dims, ob):
                    uj = min(lj + ob, self.output_dims)
                    vec = np.zeros(self.slot_count, dtype=y.dtype)
                    for i in range(li, ui):
                        for j in range(lj, uj):
                            vec[self._out_pos(i, j, li, lj)] = y[i, j]
                    row.append(adapter.encode_for_cipher(vec))
                rows.append(row)
            return Plain2d(rows)
        bbc = ceil_div(self.batch_size, bb)
        obc = ceil_div(self.output_dims, ob)
        bufs = [np.zeros(self.slot_count, dtype=y.dtype)
                for _ in range(ceil_div(bbc * obc, ib))]
        di = 0
        for li in range(0, self.batch_size, bb):
            ui = min(li + bb, self.batch_size)
            dj = 0
            for lj in range(0, self.output_dims, ob):
                uj = min(lj + ob, self.output_dims)
                cid = di * obc + dj
                pid, off = cid // ib, cid % ib
                for i in range(li, ui):
                    for j in range(lj, uj):
                        bufs[pid][(i - li) * ib * ob + (j - lj) * ib + off] = y[i, j]
                dj += 1
            di += 1
        return Plain2d([[adapter.encode_for_cipher(b) for b in bufs]])

    def pack_outputs(self, evaluator: Evaluator, auto_keys: GaloisKeys,
                     cipher: Cipher2d, mesh=None) -> Cipher2d:
        """Compress output tiles ~input_block x (ref: matmul.cu pack_outputs).
        mesh: optional ('data', 'limb') Mesh — pack groups shard over 'data',
        limbs over 'limb'."""
        if not self.pack_lwe:
            raise ValueError("[MatmulHelper.pack_outputs] pack_lwe disabled")
        ib = self.input_block
        n = self.slot_count
        inherent_shift = 0 if ib == 1 else 2 * n - (ib - 1)
        flat = [c for row in cipher.data for c in row]
        groups = [flat[i : i + ib] for i in range(0, len(flat), ib)]
        out = evaluator.pack_rlwe_ciphertexts_batched(
            groups, auto_keys, inherent_shift, ib, 1, mesh=mesh)
        return Cipher2d([out])

    # ------------------------------------------------------------------
    # wire format (ref: matmul.cu serialize_outputs / deserialize_outputs:
    # sparse save_terms for unpacked outputs, full save for packed)
    # ------------------------------------------------------------------
    def _required_terms(self):
        """Per (di, dj) block: the coefficient indices carrying outputs."""
        bb, ob, ib = self.batch_block, self.output_block, self.input_block
        blocks = []
        for li in range(0, self.batch_size, bb):
            ui = min(li + bb, self.batch_size)
            for lj in range(0, self.output_dims, ob):
                uj = min(lj + ob, self.output_dims)
                terms = [self._out_pos(i, j, li, lj)
                         for i in range(li, ui) for j in range(lj, uj)]
                blocks.append(terms)
        return blocks

    def serialize_outputs(self, context, outputs: Cipher2d, mode=None) -> list[bytes]:
        from ..utils import serialize as S

        mode = mode if mode is not None else S.CompressionMode.Nil
        if self.pack_lwe:
            return [S.save_ciphertext(c, context, mode) for c in outputs[0]]
        flat = [c for row in outputs.data for c in row]
        return [S.save_ciphertext(c, context, mode, terms=t)
                for c, t in zip(flat, self._required_terms())]

    def deserialize_outputs(self, context, blobs: list[bytes]) -> Cipher2d:
        from ..utils import serialize as S

        cts = [S.load_ciphertext(b, context) for b in blobs]
        if self.pack_lwe:
            return Cipher2d([cts])
        obc = ceil_div(self.output_dims, self.output_block)
        return Cipher2d([cts[i : i + obc] for i in range(0, len(cts), obc)])

    def serialize_encoded_weights(self, w: Plain2d, mode=None) -> list[bytes]:
        from ..utils import serialize as S

        mode = mode if mode is not None else S.CompressionMode.Nil
        return [S.save_plaintext(p, mode) for row in w.data for p in row]

    def deserialize_encoded_weights(self, blobs: list[bytes]) -> Plain2d:
        from ..utils import serialize as S

        pts = [S.load_plaintext(b) for b in blobs]
        ibc = ceil_div(self.input_dims, self.input_block)
        obc = ceil_div(self.output_dims, self.output_block)
        assert len(pts) == ibc * obc
        return Plain2d([pts[i : i + obc] for i in range(0, len(pts), obc)])

    def decrypt_outputs(self, adapter, decryptor: Decryptor,
                        outputs: Cipher2d) -> np.ndarray:
        bb, ob, ib = self.batch_block, self.output_block, self.input_block
        first = adapter.decrypt_outputs(decryptor, outputs[0][0])
        dec = np.zeros((self.batch_size, self.output_dims), dtype=np.asarray(first).dtype)
        if not self.pack_lwe:
            di = 0
            for li in range(0, self.batch_size, bb):
                ui = min(li + bb, self.batch_size)
                dj = 0
                for lj in range(0, self.output_dims, ob):
                    uj = min(lj + ob, self.output_dims)
                    buf = (first if (di == 0 and dj == 0)
                           else adapter.decrypt_outputs(decryptor, outputs[di][dj]))
                    for i in range(li, ui):
                        for j in range(lj, uj):
                            dec[i, j] = buf[self._out_pos(i, j, li, lj)]
                    dj += 1
                di += 1
            return dec
        bufs = [first] + [
            adapter.decrypt_outputs(decryptor, outputs[0][i])
            for i in range(1, len(outputs[0]))
        ]
        obc = ceil_div(self.output_dims, ob)
        di = 0
        for li in range(0, self.batch_size, bb):
            ui = min(li + bb, self.batch_size)
            dj = 0
            for lj in range(0, self.output_dims, ob):
                uj = min(lj + ob, self.output_dims)
                cid = di * obc + dj
                pid, off = cid // ib, cid % ib
                for i in range(li, ui):
                    for j in range(lj, uj):
                        dec[i, j] = bufs[pid][(i - li) * ib * ob + (j - lj) * ib + off]
                dj += 1
            di += 1
        return dec
