"""troy_tpu — a TPU-native RNS homomorphic encryption framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of troy-nova
(RNS BFV / CKKS / BGV with SEAL-compatible semantics, BumbleBee matmul,
Cheetah conv2d, LWE extraction/packing, ring2k encoding), designed TPU-first:

  * all residues live in uint32 lanes (no 64-bit integer multiply on TPU);
    fast-path primes are 29/30-bit, wide math via 16-bit limb products,
  * polynomial kernels are pure-functional jnp/Pallas ops batched over
    (ciphertext-batch, RNS-limb, coefficient) axes,
  * multi-chip scaling via jax.sharding Mesh (batch- and limb-axis sharding)
    instead of the reference's per-device memory pools.

Layer map mirrors SURVEY.md §1: utils (host numth, PRNG, serialization),
ops (u32 scalar core, poly ops, NTT, galois), rns (bases, BEHZ toolbox),
core (params/context/objects/encoders/encryptor/decryptor/evaluator),
app (matmul/conv2d/ring2k), parallel (mesh sharding).
"""

__version__ = "0.1.0"

# Lazy public API (PEP 562): heavy modules import on first attribute access.
_API = {
    "Modulus": "core.modulus",
    "CoeffModulus": "core.coeff_modulus",
    "PlainModulus": "core.coeff_modulus",
    "SecurityLevel": "core.coeff_modulus",
    "EncryptionParameters": "core.params",
    "SchemeType": "core.params",
    "HeContext": "core.context",
    "ContextData": "core.context",
    "EncryptionParameterQualifiers": "core.context",
    "Plaintext": "core.plaintext",
    "Ciphertext": "core.ciphertext",
    "SecretKey": "core.keys",
    "PublicKey": "core.keys",
    "KSwitchKeys": "core.keys",
    "RelinKeys": "core.keys",
    "GaloisKeys": "core.keys",
    "BatchEncoder": "core.batch_encoder",
    "CKKSEncoder": "core.ckks_encoder",
    "KeyGenerator": "core.keygen",
    "Encryptor": "core.encryptor",
    "Decryptor": "core.decryptor",
    "Evaluator": "core.evaluator",
    "LWECiphertext": "core.lwe",
    "PolynomialEncoderRing2k": "app.ring2k",
    "MatmulHelper": "app.matmul",
    "MatmulObjective": "app.matmul",
    "Conv2dHelper": "app.conv2d",
    "Plain2d": "app.cipher2d",
    "Cipher2d": "app.cipher2d",
    "BatchedEvaluator": "parallel.batched",
    "BatchEncoderAdapter": "app.encoder_adapter",
    "CKKSEncoderAdapter": "app.encoder_adapter",
    "Ring2kEncoderAdapter": "app.encoder_adapter",
}


def __getattr__(name):
    if name in _API:
        import importlib

        mod = importlib.import_module("." + _API[name], __name__)
        value = getattr(mod, name)
        globals()[name] = value
        return value
    raise AttributeError(f"module 'troy_tpu' has no attribute {name!r}")

__all__ = [
    "Modulus", "CoeffModulus", "PlainModulus", "SecurityLevel",
    "EncryptionParameters", "SchemeType", "HeContext", "ContextData",
    "EncryptionParameterQualifiers",
    "Plaintext", "Ciphertext", "SecretKey", "PublicKey", "KSwitchKeys",
    "RelinKeys", "GaloisKeys", "BatchEncoder", "CKKSEncoder", "KeyGenerator",
    "Encryptor", "Decryptor", "Evaluator", "LWECiphertext",
    "PolynomialEncoderRing2k", "MatmulHelper", "MatmulObjective",
    "Conv2dHelper", "Plain2d", "Cipher2d", "BatchedEvaluator",
    "BatchEncoderAdapter", "CKKSEncoderAdapter", "Ring2kEncoderAdapter",
]
