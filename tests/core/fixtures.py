"""GeneralHeContext-style test fixture (mirrors reference test/test_adv.h:1005):
bundles context + keygen + encryptor + decryptor + evaluator + encoder for a
scheme/parameter combo, so one test body covers BFV/BGV/CKKS."""

import numpy as np

from troy_tpu.core.params import EncryptionParameters, SchemeType
from troy_tpu.core.context import HeContext
from troy_tpu.core.coeff_modulus import CoeffModulus, PlainModulus, SecurityLevel
from troy_tpu.core.keygen import KeyGenerator
from troy_tpu.core.encryptor import Encryptor
from troy_tpu.core.decryptor import Decryptor
from troy_tpu.core.evaluator import Evaluator
from troy_tpu.core.batch_encoder import BatchEncoder


class GeneralHeContext:
    def __init__(self, scheme, n, log_t=20, q_bits=(30, 30, 30, 30),
                 expand_mod_chain=True, seed=0x5EED, scale=None):
        scheme = SchemeType[scheme] if isinstance(scheme, str) else scheme
        parms = EncryptionParameters(scheme)
        parms.set_poly_modulus_degree(n)
        parms.set_coeff_modulus(CoeffModulus.create(n, list(q_bits)))
        if scheme != SchemeType.CKKS:
            parms.set_plain_modulus(PlainModulus.batching(n, log_t))
        self.parms = parms
        self.context = HeContext.create(parms, expand_mod_chain,
                                        SecurityLevel.Nil, seed)
        self.keygen = KeyGenerator(self.context)
        self.sk = self.keygen.secret_key
        self.pk = self.keygen.create_public_key()
        self.encryptor = Encryptor(self.context, pk=self.pk, sk=self.sk)
        self.decryptor = Decryptor(self.context, self.sk)
        self.evaluator = Evaluator(self.context)
        self.scheme = scheme
        self.n = n
        if scheme != SchemeType.CKKS:
            self.encoder = BatchEncoder(self.context)
            self.t = parms.plain_modulus.value
        else:
            from troy_tpu.core.ckks_encoder import CKKSEncoder

            self.encoder = CKKSEncoder(self.context)
            self.scale = scale or 2.0 ** 40

    # -- helpers ------------------------------------------------------------
    def random_simd(self, rng):
        return rng.integers(0, self.t, size=self.encoder.slot_count, dtype=np.uint64)

    def encrypt(self, values, asym=True):
        if self.scheme == SchemeType.CKKS:
            pt = self.encoder.encode(values, scale=self.scale)
        else:
            pt = self.encoder.encode(values)
        return (self.encryptor.encrypt_asymmetric(pt) if asym
                else self.encryptor.encrypt_symmetric(pt))

    def decrypt(self, ct):
        return self.encoder.decode(self.decryptor.decrypt(ct))
