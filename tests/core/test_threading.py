"""Concurrency tests (the analog of reference test/multithread.cu: one
context shared by many threads, plus thread-local contexts).  The functional
design makes ciphertexts immutable, so the properties under test are
(a) correctness of concurrent op streams sharing one HeContext and its
per-level jit caches, and (b) benign racing of first-call compilation."""

import concurrent.futures as cf

import numpy as np
import pytest

from tests.core.fixtures import GeneralHeContext

RNG = np.random.default_rng(7171)
THREADS = 8


def _mk(scheme="BFV", q_bits=(30, 30, 30)):
    h = GeneralHeContext(scheme, 32, log_t=20, q_bits=q_bits, scale=2.0 ** 30)
    h._rlk = h.keygen.create_relin_keys()
    return h


def test_concurrent_encrypt_op_decrypt_shared_context():
    h = _mk()
    vs = [h.random_simd(np.random.default_rng(1000 + i))
          for i in range(THREADS)]

    def work(i):
        v = vs[i]
        ct = h.encrypt(v)
        sq = h.evaluator.relinearize(h.evaluator.multiply(ct, ct), h._rlk)
        got = np.asarray(h.decrypt(sq), np.uint64)
        want = np.mod(v.astype(object) * v.astype(object), h.t)
        return all(int(a) == int(b) for a, b in zip(got, want))

    with cf.ThreadPoolExecutor(THREADS) as ex:
        assert all(ex.map(work, range(THREADS)))


def test_concurrent_first_compile_race():
    """All threads hit the same per-level jit cache on its FIRST call."""
    h = _mk("CKKS")
    n2 = h.encoder.slot_count
    vs = [np.random.default_rng(i).uniform(-1, 1, n2) for i in range(THREADS)]
    cts = [h.encryptor.encrypt_asymmetric(h.encoder.encode(v, scale=2.0 ** 30))
           for v in vs]

    def work(i):
        prod = h.evaluator.relinearize(
            h.evaluator.multiply(cts[i], cts[i]), h._rlk)
        got = h.encoder.decode(h.decryptor.decrypt(prod))
        return np.allclose(got, vs[i] * vs[i], atol=1e-2)

    with cf.ThreadPoolExecutor(THREADS) as ex:
        assert all(ex.map(work, range(THREADS)))


def test_thread_local_contexts():
    """Independent contexts per thread (ref multithread.cu device-per-thread
    cases collapse to context-per-thread here)."""

    def work(i):
        h = _mk()
        v1 = h.random_simd(np.random.default_rng(i))
        v2 = h.random_simd(np.random.default_rng(100 + i))
        s = h.evaluator.add(h.encrypt(v1), h.encrypt(v2))
        got = np.asarray(h.decrypt(s), np.uint64)
        want = np.mod(v1.astype(object) + v2.astype(object), h.t)
        return all(int(a) == int(b) for a, b in zip(got, want))

    with cf.ThreadPoolExecutor(4) as ex:
        assert all(ex.map(work, range(4)))


def test_concurrent_rotations_share_galois_cache():
    h = _mk()
    glk = h.keygen.create_galois_keys()
    v = h.random_simd(np.random.default_rng(9))
    ct = h.encrypt(v)
    half = h.n // 2
    grid = v.reshape(2, half)

    def work(step):
        out = h.evaluator.rotate_rows(ct, step, glk)
        got = np.asarray(h.decrypt(out), np.uint64).reshape(2, half)
        want = np.roll(grid, -step, axis=1)
        return np.array_equal(got, want)

    steps = [1, 2, 3, 5, 7, -1, -3, 4]
    with cf.ThreadPoolExecutor(THREADS) as ex:
        assert all(ex.map(work, steps))


def test_concurrent_serialization_roundtrip():
    from troy_tpu.utils import serialize as S

    h = _mk()
    vs = [h.random_simd(np.random.default_rng(50 + i))
          for i in range(THREADS)]
    cts = [h.encrypt(v) for v in vs]

    def work(i):
        blob = S.save_ciphertext(cts[i], h.context)
        back = S.load_ciphertext(blob, h.context)
        got = np.asarray(h.decrypt(back), np.uint64)
        return all(int(a) == int(b) for a, b in zip(got, vs[i]))

    with cf.ThreadPoolExecutor(THREADS) as ex:
        assert all(ex.map(work, range(THREADS)))
