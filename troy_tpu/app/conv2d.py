"""Cheetah-style ciphertext-plaintext 2D convolution helper.

TPU-native rebuild of reference src/app/conv2d.{h,cu} (804 LoC).  Valid
(no-padding) convolution y[b, oc] = sum_ic x[b, ic] * k[oc, ic] via
negacyclic polynomial products, with block partition over batch / channels /
overlapping image tiles (tile step = block - kernel + 1).

Slot layout (identical to the reference so decrypt positions match):
  block_size = h_blk * w_blk
  input  [eb][icg]: vec[b*(ci*co*bs) + tci*bs + ti*w_blk + tj] = x[...]
  weight [ocg][icg]: vec[(oc)*(ci*bs) + (ci-1-tic)*bs + ki*w_blk + kj]
                      = k[oc, ic, kh-1-ki, kw-1-kj]      (flipped kernel)
  output pixel (i, j) of tile: coeff[(b*ci*co + oc*ci + ci-1)*bs
                      + (kh-1+i)*w_blk + (kw-1+j)]
"""

from __future__ import annotations

import numpy as np

from .cipher2d import Plain2d, Cipher2d
from .matmul import MatmulObjective, ceil_div
from ..core.encryptor import Encryptor
from ..core.decryptor import Decryptor
from ..core.evaluator import Evaluator


class Conv2dHelper:
    def __init__(self, batch_size: int, input_channels: int, output_channels: int,
                 image_height: int, image_width: int,
                 kernel_height: int, kernel_width: int, slot_count: int,
                 objective: MatmulObjective = MatmulObjective.EncryptLeft):
        self.batch_size = batch_size
        self.input_channels = input_channels
        self.output_channels = output_channels
        self.image_height = image_height
        self.image_width = image_width
        self.kernel_height = kernel_height
        self.kernel_width = kernel_width
        self.slot_count = slot_count
        self.objective = MatmulObjective(objective)
        self._determine_block()

    # ------------------------------------------------------------------
    def _determine_block(self):
        """Exhaustive cost search (ref: conv2d.cu:31 determine_block)."""
        best = 1 << 62
        B, Ci, Co = self.batch_size, self.input_channels, self.output_channels
        H, W, kh, kw = (self.image_height, self.image_width,
                        self.kernel_height, self.kernel_width)
        n = self.slot_count
        found = None
        for b in range(B, 0, -1):
            for h in range(min(H, n // b), kh - 1, -1):
                for w in range(min(W, n // b // h), kw - 1, -1):
                    for co in range(min(Co, n // b // h // w), 0, -1):
                        ci = min(n // b // h // w // co, Ci)
                        if ci == 0:
                            continue
                        tiles = (ceil_div(B, b)
                                 * ceil_div(H - kh + 1, h - kh + 1)
                                 * ceil_div(W - kw + 1, w - kw + 1))
                        in_sz = tiles * ceil_div(Ci, ci)
                        out_sz = tiles * ceil_div(Co, co)
                        w_sz = ceil_div(Ci, ci) * ceil_div(Co, co)
                        if self.objective == MatmulObjective.EncryptLeft:
                            cur = in_sz + out_sz
                        elif self.objective == MatmulObjective.EncryptRight:
                            cur = w_sz + out_sz
                        else:
                            cur = in_sz + out_sz + w_sz
                        if cur < best:
                            best = cur
                            found = (b, h, w, ci, co)
        if found is None:
            raise ValueError("[Conv2dHelper] image/kernel does not fit slot count")
        (self.batch_block, self.image_height_block, self.image_width_block,
         self.input_channel_block, self.output_channel_block) = found

    def _tile_counts(self):
        kh, kw = self.kernel_height - 1, self.kernel_width - 1
        sh = ceil_div(self.image_height - kh, self.image_height_block - kh)
        sw = ceil_div(self.image_width - kw, self.image_width_block - kw)
        return sh, sw

    def get_total_batch_size(self) -> int:
        sh, sw = self._tile_counts()
        return ceil_div(self.batch_size, self.batch_block) * sh * sw

    # ------------------------------------------------------------------
    def encode_weights(self, adapter, weights, for_cipher: bool = False) -> Plain2d:
        """weights: (out_channels, in_channels, kh, kw)."""
        k = np.asarray(weights)
        bs = self.image_height_block * self.image_width_block
        ci_b, co_b = self.input_channel_block, self.output_channel_block
        rows = []
        for loc in range(0, self.output_channels, co_b):
            uoc = min(loc + co_b, self.output_channels)
            row = []
            for lic in range(0, self.input_channels, ci_b):
                uic = min(lic + ci_b, self.input_channels)
                vec = np.zeros(ci_b * co_b * bs, dtype=k.dtype)
                for oc in range(loc, uoc):
                    for ic in range(lic, uic):
                        for ki in range(self.kernel_height):
                            for kj in range(self.kernel_width):
                                idx = ((oc - loc) * ci_b * bs
                                       + (ci_b - 1 - (ic - lic)) * bs
                                       + ki * self.image_width_block + kj)
                                vec[idx] = k[oc, ic,
                                             self.kernel_height - 1 - ki,
                                             self.kernel_width - 1 - kj]
                row.append(adapter.encode_for_cipher(vec) if for_cipher
                           else adapter.encode_for_plain(vec))
            rows.append(row)
        return Plain2d(rows)

    def encode_inputs(self, adapter, inputs, for_cipher: bool = True) -> Plain2d:
        """inputs: (batch, in_channels, H, W)."""
        x = np.asarray(inputs)
        kh, kw = self.kernel_height - 1, self.kernel_width - 1
        sh, sw = self._tile_counts()
        bs = self.image_height_block * self.image_width_block
        ci_b, co_b = self.input_channel_block, self.output_channel_block
        rows = []
        for lb in range(0, self.batch_size, self.batch_block):
            ub = min(lb + self.batch_block, self.batch_size)
            for ih in range(sh):
                for iw in range(sw):
                    si = ih * (self.image_height_block - kh)
                    sj = iw * (self.image_width_block - kw)
                    ui = min(si + self.image_height_block, self.image_height)
                    uj = min(sj + self.image_width_block, self.image_width)
                    group = []
                    for lci in range(0, self.input_channels, ci_b):
                        uci = min(lci + ci_b, self.input_channels)
                        vec = np.zeros(self.slot_count, dtype=x.dtype)
                        for b in range(ub - lb):
                            for tci in range(uci - lci):
                                for ti in range(si, ui):
                                    for tj in range(sj, uj):
                                        idx = (b * ci_b * co_b * bs + tci * bs
                                               + (ti - si) * self.image_width_block
                                               + (tj - sj))
                                        vec[idx] = x[lb + b, lci + tci, ti, tj]
                        group.append(adapter.encode_for_cipher(vec) if for_cipher
                                     else adapter.encode_for_plain(vec))
                    rows.append(group)
        return Plain2d(rows)

    def encrypt_inputs(self, encryptor: Encryptor, adapter, inputs) -> Cipher2d:
        return self.encode_inputs(adapter, inputs, True).encrypt_symmetric(encryptor)

    def encrypt_weights(self, encryptor: Encryptor, adapter, weights) -> Cipher2d:
        return self.encode_weights(adapter, weights, True).encrypt_symmetric(encryptor)

    # ------------------------------------------------------------------
    def conv2d(self, evaluator: Evaluator, a: Cipher2d, w: Plain2d,
               mesh=None) -> Cipher2d:
        """Whole channel contraction in one fused kernel
        (ref: conv2d.cu:356).  mesh: optional ('data', 'limb') Mesh — batch
        tiles shard over 'data', RNS limbs over 'limb'."""
        total = self.get_total_batch_size()
        ocg = ceil_div(self.output_channels, self.output_channel_block)
        icg = ceil_div(self.input_channels, self.input_channel_block)
        cts = [[a[eb][i] for i in range(icg)] for eb in range(total)]
        pls = [[w[j][i] for j in range(ocg)] for i in range(icg)]
        return Cipher2d(evaluator.multiply_plain_contract(cts, pls, mesh=mesh))

    def conv2d_reverse(self, evaluator: Evaluator, a: Plain2d, w: Cipher2d) -> Cipher2d:
        total = self.get_total_batch_size()
        ocg = ceil_div(self.output_channels, self.output_channel_block)
        icg = ceil_div(self.input_channels, self.input_channel_block)
        ret = []
        for eb in range(total):
            row = []
            for j in range(ocg):
                acc = None
                for i in range(icg):
                    prod = evaluator.multiply_plain(w[j][i], a[eb][i])
                    acc = prod if acc is None else evaluator.add(acc, prod)
                row.append(acc)
            ret.append(row)
        return Cipher2d(ret)

    def conv2d_cipher(self, evaluator: Evaluator, a: Cipher2d, w: Cipher2d) -> Cipher2d:
        total = self.get_total_batch_size()
        ocg = ceil_div(self.output_channels, self.output_channel_block)
        icg = ceil_div(self.input_channels, self.input_channel_block)
        ret = []
        for eb in range(total):
            row = []
            for j in range(ocg):
                acc = None
                for i in range(icg):
                    prod = evaluator.multiply(a[eb][i], w[j][i])
                    acc = prod if acc is None else evaluator.add(acc, prod)
                row.append(acc)
            ret.append(row)
        return Cipher2d(ret)

    # ------------------------------------------------------------------
    def _positions(self):
        """Yields (eb, ocg_index, mask_index, (b, c, oi, oj)) mappings."""
        bs = self.image_height_block * self.image_width_block
        ci_b, co_b = self.input_channel_block, self.output_channel_block
        yh = self.image_height_block - self.kernel_height + 1
        yw = self.image_width_block - self.kernel_width + 1
        oyh = self.image_height - self.kernel_height + 1
        oyw = self.image_width - self.kernel_width + 1
        sh, sw = self._tile_counts()
        total = self.get_total_batch_size()
        for eb in range(total):
            ob = eb // (sh * sw)
            si = (eb % (sh * sw)) // sw
            sj = eb % sw
            lb = ob * self.batch_block
            ub = min(lb + self.batch_block, self.batch_size)
            for lc in range(0, self.output_channels, co_b):
                uc = min(lc + co_b, self.output_channels)
                for b in range(lb, ub):
                    for c in range(lc, uc):
                        for i in range(yh):
                            for j in range(yw):
                                if si * yh + i >= oyh or sj * yw + j >= oyw:
                                    continue
                                mask_index = (
                                    ((b - lb) * ci_b * co_b + (c - lc) * ci_b + ci_b - 1) * bs
                                    + (self.image_height_block - yh + i) * self.image_width_block
                                    + (self.image_width_block - yw + j))
                                yield (eb, lc // co_b, mask_index,
                                       (b, c, si * yh + i, sj * yw + j))

    def encode_outputs(self, adapter, outputs) -> Plain2d:
        """outputs: (batch, out_channels, H-kh+1, W-kw+1) bias matrix."""
        y = np.asarray(outputs)
        total = self.get_total_batch_size()
        ocg = ceil_div(self.output_channels, self.output_channel_block)
        bufs = [[np.zeros(self.slot_count, dtype=y.dtype) for _ in range(ocg)]
                for _ in range(total)]
        for eb, jg, mi, (b, c, oi, oj) in self._positions():
            bufs[eb][jg][mi] = y[b, c, oi, oj]
        return Plain2d([[adapter.encode_for_cipher(v) for v in row] for row in bufs])

    # ------------------------------------------------------------------
    # wire format (ref: conv2d.h:113-114 serialize_outputs /
    # deserialize_outputs; conv2d.cu:719-803): only the coefficients that
    # carry output pixels are shipped (sparse save_terms), same framing as
    # MatmulHelper (matmul.py:317)
    # ------------------------------------------------------------------
    def _required_terms(self) -> list[list[list[int]]]:
        """terms[eb][ocg] = sorted coefficient indices carrying outputs."""
        total = self.get_total_batch_size()
        ocg = ceil_div(self.output_channels, self.output_channel_block)
        terms: list[list[list[int]]] = [
            [[] for _ in range(ocg)] for _ in range(total)
        ]
        for eb, jg, mi, _ in self._positions():
            terms[eb][jg].append(mi)
        return [[sorted(cell) for cell in row] for row in terms]

    def serialize_outputs(self, context, outputs: Cipher2d, mode=None) -> list[bytes]:
        from ..utils import serialize as S

        mode = mode if mode is not None else S.CompressionMode.Nil
        terms = self._required_terms()
        return [
            S.save_ciphertext(c, context, mode, terms=terms[eb][jg])
            for eb, row in enumerate(outputs.data)
            for jg, c in enumerate(row)
        ]

    def deserialize_outputs(self, context, blobs: list[bytes]) -> Cipher2d:
        from ..utils import serialize as S

        cts = [S.load_ciphertext(b, context) for b in blobs]
        ocg = ceil_div(self.output_channels, self.output_channel_block)
        return Cipher2d([cts[i : i + ocg] for i in range(0, len(cts), ocg)])

    def decrypt_outputs(self, adapter, decryptor: Decryptor,
                        outputs: Cipher2d) -> np.ndarray:
        oyh = self.image_height - self.kernel_height + 1
        oyw = self.image_width - self.kernel_width + 1
        cache: dict[tuple[int, int], np.ndarray] = {}
        first = adapter.decrypt_outputs(decryptor, outputs[0][0])
        cache[(0, 0)] = first
        ret = np.zeros((self.batch_size, self.output_channels, oyh, oyw),
                       dtype=np.asarray(first).dtype)
        for eb, jg, mi, (b, c, oi, oj) in self._positions():
            if (eb, jg) not in cache:
                cache[(eb, jg)] = adapter.decrypt_outputs(decryptor, outputs[eb][jg])
            ret[b, c, oi, oj] = cache[(eb, jg)][mi]
        return ret
