"""Per-operation DEVICE benchmark matrix with slope-honest timing.

Reproduces the reference `troybench` op list
(test/bench/he_operations.cu:15-50: encode / encrypt / negate / add /
multiply+relinearize / multiply_plain / mod_switch_to_next /
rescale_to_next / rotate_rows / rotate_columns / rotate_vector /
complex_conjugate) on the real TPU with the SAME honesty rules as bench.py
(BENCH.md "Harness note"): each device op is a pure raw-array step chained
REPS times inside one jitted fori_loop, timed at two rep counts, and the
slope cancels the constant tunnel dispatch/readback term.  Ops that shrink
the ciphertext (multiply's third poly, modswitch/rescale's dropped limb)
are re-expanded through a modular add/sub round trip of a fixed tensor —
an exact identity XLA cannot fold away, preserving the data dependency.

encode/encrypt/decrypt/decode are CLIENT-side host ops by design (they run
on the CPU in any deployment); their wall-clock is measured eagerly in the
pure-CPU setup subprocess and reported alongside.

Usage:
  python scripts/troybench_tpu.py --scheme bfv [--q-bits 60,40,40,60]
      [--batch 16] [-n 8192] [--reps 100]
Markdown rows print to stdout; run scripts/troybench_sweep.sh for the full
scheme x width matrix.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CACHE = os.environ.get("TROY_BENCH_CACHE", "/tmp/troy_bench_cache")


def _log(msg):
    print(f"[troybench] {time.strftime('%H:%M:%S')} {msg}",
          file=sys.stderr, flush=True)


def _tag(args):
    qb = "-".join(str(b) for b in args.qbits)
    return f"perop_{args.scheme}_n{args.poly_degree}_q{qb}"


def _setup_path(args):
    return os.path.join(CACHE, _tag(args) + ".npz")


def setup_impl(args):
    """Runs inside a JAX_PLATFORMS=cpu subprocess: builds context, keys,
    ciphertexts; times the client-side host ops eagerly; writes one npz."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from troy_tpu.core.params import EncryptionParameters, SchemeType
    from troy_tpu.core.context import HeContext
    from troy_tpu.core.coeff_modulus import (CoeffModulus, PlainModulus,
                                             SecurityLevel)
    from troy_tpu.core.keygen import KeyGenerator
    from troy_tpu.core.encryptor import Encryptor
    from troy_tpu.core.decryptor import Decryptor
    from troy_tpu.core.evaluator import Evaluator
    from troy_tpu.core.batch_encoder import BatchEncoder
    from troy_tpu.core.ckks_encoder import CKKSEncoder
    from troy_tpu.ops.galois import GaloisTool

    scheme = SchemeType[args.scheme.upper()]
    n = args.poly_degree
    parms = EncryptionParameters(scheme)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, list(args.qbits)))
    if scheme != SchemeType.CKKS:
        parms.set_plain_modulus(PlainModulus.batching(n, 20))
    context = HeContext.create(parms, True, SecurityLevel.Nil, 7)
    keygen = KeyGenerator(context)
    encryptor = Encryptor(context, sk=keygen.secret_key,
                          pk=keygen.create_public_key())
    decryptor = Decryptor(context, keygen.secret_key)
    rng = np.random.default_rng(5)
    if scheme == SchemeType.CKKS:
        encoder = CKKSEncoder(context)
        scale = 2.0 ** 25
        v = rng.uniform(-1, 1, encoder.slot_count)
        enc = lambda: encoder.encode(v, scale=scale)
    else:
        encoder = BatchEncoder(context)
        t = parms.plain_modulus.value
        v = rng.integers(0, t, encoder.slot_count, dtype=np.uint64)
        enc = lambda: encoder.encode(v)
    pt = enc()
    ct1 = encryptor.encrypt_asymmetric(pt)
    ct2 = encryptor.encrypt_asymmetric(pt)
    rlk = keygen.create_relin_keys()
    elt_rot = GaloisTool.get_element_from_step(1, n)
    elt_conj = GaloisTool.conjugate_element(n)
    glk = keygen.create_galois_keys_from_elements([elt_rot, elt_conj])

    # client-side host op timings (eager, warm; median of reps)
    host = {}

    def timeit(name, fn, probe, reps=8):
        import jax as _j

        out = fn()
        _j.block_until_ready(probe(out))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            _j.block_until_ready(probe(out))
            ts.append(time.perf_counter() - t0)
        host[name] = sorted(ts)[len(ts) // 2]

    timeit("encode_simd (host)", enc, lambda p: p.data)
    timeit("decode_simd (host)", lambda: encoder.decode(pt), lambda x: x)
    timeit("encrypt_asymmetric (host)",
           lambda: encryptor.encrypt_asymmetric(pt), lambda c: c.data)
    timeit("encrypt_symmetric (host)",
           lambda: encryptor.encrypt_symmetric(pt), lambda c: c.data)
    timeit("decrypt (host)", lambda: decryptor.decrypt(ct1),
           lambda p: p.data)

    os.makedirs(CACHE, exist_ok=True)
    inv_cf = 1
    if scheme == SchemeType.BGV:
        from troy_tpu.utils import numth

        inv_cf = numth.invert_mod(ct1.correction_factor, t)
    np.savez(
        _setup_path(args),
        ct1=np.asarray(ct1.data), ct2=np.asarray(ct2.data),
        pt=np.asarray(pt.data), pt_ntt=np.uint8(pt.is_ntt_form),
        sk=np.asarray(keygen.secret_key.data),
        pk=np.asarray(encryptor.pk.data()),
        spow=np.asarray(decryptor._power(1)),
        inv_cf=np.uint64(inv_cf),
        scale=np.float64(scale if scheme == SchemeType.CKKS else 0.0),
        rlk=np.asarray(rlk.key(2)),
        glk_rot=np.asarray(glk.key(elt_rot)),
        glk_conj=np.asarray(glk.key(elt_conj)),
        elt_rot=np.int64(elt_rot), elt_conj=np.int64(elt_conj),
        host_json=np.bytes_(json.dumps(host).encode()),
    )


def build_steps(args, data):
    """Build the per-op pure step functions (raw stacked arrays) on the CPU
    backend; returns (steps dict, device arrays dict)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from troy_tpu.core.params import EncryptionParameters, SchemeType
    from troy_tpu.core.context import HeContext
    from troy_tpu.core.coeff_modulus import (CoeffModulus, PlainModulus,
                                             SecurityLevel)
    from troy_tpu.core.evaluator import Evaluator
    from troy_tpu.parallel.batched import BatchedEvaluator
    from troy_tpu.ops import rp as R

    scheme = SchemeType[args.scheme.upper()]
    n = args.poly_degree
    B = args.batch
    with jax.default_device(jax.devices("cpu")[0]):
        parms = EncryptionParameters(scheme)
        parms.set_poly_modulus_degree(n)
        parms.set_coeff_modulus(CoeffModulus.create(n, list(args.qbits)))
        if scheme != SchemeType.CKKS:
            parms.set_plain_modulus(PlainModulus.batching(n, 20))
        context = HeContext.create(parms, True, SecurityLevel.Nil, 7)
        evaluator = Evaluator(context)
        cd = context.first_context_data()
        be = BatchedEvaluator(evaluator, cd)
        qtab = cd.qtab()
        pax = R.poly_axis(qtab)
        ntt_form = scheme in (SchemeType.CKKS, SchemeType.BGV)

        def bcast(a):
            return jnp.asarray(
                np.broadcast_to(a[None], (B,) + a.shape).copy())

        arrs = {
            "d1": bcast(data["ct1"]), "d2": bcast(data["ct2"]),
            "pt": jnp.asarray(data["pt"]), "rlk": jnp.asarray(data["rlk"]),
            "glk_rot": jnp.asarray(data["glk_rot"]),
            "glk_conj": jnp.asarray(data["glk_conj"]),
        }
        steps = {}
        steps["negate"] = ("d2", lambda cur, aux: R.negate(cur, qtab))
        steps["add"] = ("d2", lambda cur, aux: R.add(cur, aux, qtab))
        mr = be.build_mul_relin_step(arrs["rlk"])

        def mul_only(cur, aux):
            prod = be.multiply(cur, aux)
            return lax.slice_in_dim(prod, 0, 2, axis=pax)

        steps["multiply"] = ("d2", mul_only)
        steps["multiply_relinearize"] = ("rlk", lambda cur, k: mr(cur, arrs["d2"], k))
        plain_ntt = bool(data["pt_ntt"])
        rns = plain_ntt or scheme == SchemeType.CKKS
        if not rns and scheme != SchemeType.CKKS:
            evaluator._centralizer(cd)  # materialize before tracing

        def mul_plain(cur, aux):
            return evaluator._multiply_plain_impl(
                cd, cur, aux, rns, plain_ntt, ntt_form)

        steps["multiply_plain"] = ("pt", mul_plain)

        if not cd.is_last():
            ms = be.build_mod_switch_step()
            last = cd.parms.coeff_modulus[-1].value
            limb_ax = -2

            def reexpand(out, fixed):
                """Append the dropped last limb back with an exact modular
                add/sub round trip of `fixed` through a probe of `out` —
                a data dependency XLA cannot fold (no modular algebra)."""
                from troy_tpu.ops import u32 as U
                from troy_tpu.ops import u64 as W

                if R.words(qtab) == 1:
                    probe = lax.slice_in_dim(out, 0, 1, axis=limb_ax)
                    q_last = U.U32(last)
                    dep = U.sub_mod(U.cond_sub(fixed + probe, q_last),
                                    probe, q_last)
                    return jnp.concatenate([out, dep], axis=limb_ax)
                probe = lax.slice_in_dim(out, 0, 1, axis=limb_ax)
                ph, pl = probe[..., 0, :, :], probe[..., 1, :, :]
                fh, fl = fixed[..., 0, :, :], fixed[..., 1, :, :]
                qh = U.U32(last >> 32)
                ql = U.U32(last & 0xFFFFFFFF)
                sh_, sl_ = W.add_mod64(fh, fl, ph, pl, qh, ql)
                dh, dl = W.sub_mod64(sh_, sl_, ph, pl, qh, ql)
                dep = R.pair(dh, dl)
                return jnp.concatenate([out, dep], axis=limb_ax)

            fixed_limb = lax.slice_in_dim(
                arrs["d2"], arrs["d2"].shape[limb_ax] - 1, None, axis=limb_ax)

            def mod_switch(cur, aux):
                return reexpand(ms(cur), aux)

            steps["mod_switch_to_next"] = (None, mod_switch)
            arrs[None] = fixed_limb
            if scheme == SchemeType.CKKS:
                rs = be.build_rescale_step()
                steps["rescale_to_next"] = (None,
                                            lambda cur, aux: reexpand(rs(cur), aux))

        rot_step = be.build_galois_step([int(data["elt_rot"])])
        conj_step = be.build_galois_step([int(data["elt_conj"])])
        rot_name = ("rotate_vector(1)" if scheme == SchemeType.CKKS
                    else "rotate_rows(1)")
        conj_name = ("complex_conjugate" if scheme == SchemeType.CKKS
                     else "rotate_columns")
        steps[rot_name] = ("glk_rot", lambda cur, k: rot_step(cur, (k,)))
        steps[conj_name] = ("glk_conj", lambda cur, k: conj_step(cur, (k,)))

        # -- device client-op rows (VERDICT r04 item 4: the reference
        # benches encode/encrypt/decrypt/decode as DEVICE ops in the same
        # loop, test/bench/he_operations.cu:15-50; kernels rlwe.cu:1-477,
        # batch_encoder.cu:169-228, ckks_encoder.cu:231/1092) ------------
        from troy_tpu.parallel.batched import BatchedClient
        from troy_tpu.utils.random import RandomGenerator
        from troy_tpu.ops import u32 as U32
        from troy_tpu.ops import u64 as W64

        bc = BatchedClient(context, cd)
        base = RandomGenerator(997).base_keys
        arrs["pk"] = jnp.asarray(data["pk"])
        arrs["sk"] = jnp.asarray(data["sk"])
        pt_dev = jnp.asarray(data["pt"])
        steps["encrypt_asymmetric (device)"] = ("pk", bc.build_encrypt_asymmetric_step(
            base, pt_dev, plain_ntt, rns))
        steps["encrypt_symmetric (device)"] = ("sk", bc.build_encrypt_symmetric_step(
            base, pt_dev, plain_ntt, rns))

        dstep = bc.build_decrypt_step([jnp.asarray(data["spow"])], size=2,
                                      inv_cf=int(data["inv_cf"]))
        q0v = cd.parms.coeff_modulus[0].value

        def decrypt_row(cur, aux):
            # chain: exact modular round trip of limb 0 by a 20-bit probe
            # of the decrypted output (data dependence XLA cannot fold;
            # cur comes back bit-identical)
            pt_out = dstep(cur)
            p20 = pt_out.reshape(-1)[0] & jnp.uint32(0xFFFFF)
            first = lax.slice_in_dim(cur, 0, 1, axis=-2)
            rest = lax.slice_in_dim(cur, 1, None, axis=-2)
            if R.words(qtab) == 1:
                q0 = np.uint32(q0v)
                dep = U32.sub_mod(U32.add_mod(first, p20, q0), p20, q0)
            else:
                fh, fl = first[..., 0, :, :], first[..., 1, :, :]
                qh = np.uint32(q0v >> 32)
                ql = np.uint32(q0v & 0xFFFFFFFF)
                z = jnp.uint32(0)
                sh_, sl_ = W64.add_mod64(fh, fl, z, p20, qh, ql)
                dh, dl = W64.sub_mod64(sh_, sl_, z, p20, qh, ql)
                dep = jnp.stack([dh, dl], axis=-3)
            return jnp.concatenate([dep, rest], axis=-2)

        steps["decrypt (device)"] = (None, decrypt_row)
        if None not in arrs:
            arrs[None] = jnp.zeros((1,), jnp.uint32)

        if scheme != SchemeType.CKKS:
            from troy_tpu.core.batch_encoder import BatchEncoder

            benc = BatchEncoder(context)
            if benc.simd_encoding_supported:
                t = parms.plain_modulus.value
                arrs["slots"] = jnp.asarray(np.random.default_rng(11).integers(
                    0, t, (B, n), dtype=np.uint64).astype(np.uint32))
                enc_step = bc.build_batch_encode_step(benc)
                dec_step = bc.build_batch_decode_step(benc)
                steps["encode_simd (device)"] = (
                    "slots", lambda cur, aux: enc_step(cur), "slots")
                steps["decode_simd (device)"] = (
                    "slots", lambda cur, aux: dec_step(cur), "slots")
        else:
            from troy_tpu.core.ckks_encoder import CKKSEncoder
            from troy_tpu.ops import ddfft as DD

            cenc = CKKSEncoder(context)
            scale = float(data["scale"])
            rng2 = np.random.default_rng(11)
            vv = (rng2.uniform(-1, 1, (B, cenc.slot_count))
                  + 1j * rng2.uniform(-1, 1, (B, cenc.slot_count)))
            ev = np.zeros((B, n), dtype=np.complex128)
            ev[..., cenc._idx] = vv
            ev[..., cenc._idx_conj] = np.conj(vv)
            rh, rl = DD.split_f64(ev.real)
            ih, il = DD.split_f64(ev.imag)
            arrs["cplanes"] = jnp.stack([jnp.asarray(c) for c in
                                         (rh, rl, ih, il)])
            f_h, f_l = DD.split_f64(np.float64(scale / n))
            efn = cenc._encode_device_jit(cd, 2)

            def ck_encode(cur, aux):
                out = efn(cur[0], cur[1], cur[2], cur[3],
                          jnp.asarray(f_h), jnp.asarray(f_l))
                delta = ((out.reshape(-1)[0] & jnp.uint32(1))
                         .astype(jnp.float32) * jnp.float32(2.0 ** -18))
                return cur.at[0].add(delta)

            steps["encode_simd (device)"] = ("slots_unused", ck_encode,
                                             "cplanes")
            arrs["slots_unused"] = jnp.zeros((1,), jnp.uint32)

            import math

            # decode_device's dd-f32 pipeline requires margin = log2(Q/scale)
            # < ~120 bits (its serving envelope; see decode_device docstring).
            # The bench plaintext sits at the fresh level (margin ~185), so
            # this row times the kernel at a nominal 26-bit serving margin —
            # identical pipeline/shapes, timing-only caveat like the rotate
            # rows' reused keys.
            Q = cd.total_coeff_modulus
            dec_scale = math.ldexp(1.0, Q.bit_length() - 26)
            margin = max(0.0, Q.bit_length() - math.log2(dec_scale))
            K = max(5, 4 + math.ceil((margin + 40) / 32))
            qs_h, qs_l = DD.ratio_dd(Q, dec_scale)
            dfn = cenc._decode_device_jit(cd, True, K)
            arrs["ptstack"] = jnp.asarray(np.broadcast_to(
                np.asarray(data["pt"])[None], (B,) + data["pt"].shape).copy())

            def ck_decode(cur, aux):
                out = dfn(cur, jnp.asarray(qs_h), jnp.asarray(qs_l))
                p20 = ((jnp.abs(out[0].reshape(-1)[0]) * jnp.float32(2.0 ** 20))
                       .astype(jnp.uint32) & jnp.uint32(0xFFFFF))
                first = lax.slice_in_dim(cur, 0, 1, axis=-2)
                rest = lax.slice_in_dim(cur, 1, None, axis=-2)
                if R.words(qtab) == 1:
                    q0 = np.uint32(q0v)
                    dep = U32.sub_mod(U32.add_mod(first, p20, q0), p20, q0)
                else:
                    fh, fl = first[..., 0, :, :], first[..., 1, :, :]
                    qh = np.uint32(q0v >> 32)
                    ql = np.uint32(q0v & 0xFFFFFFFF)
                    z = jnp.uint32(0)
                    sh_, sl_ = W64.add_mod64(fh, fl, z, p20, qh, ql)
                    dh, dl = W64.sub_mod64(sh_, sl_, z, p20, qh, ql)
                    dep = jnp.stack([dh, dl], axis=-3)
                return jnp.concatenate([dep, rest], axis=-2)

            steps["decode_simd (device)"] = ("slots_unused", ck_decode,
                                             "ptstack")
    return steps, arrs


def slope_time(step, cur0, aux, reps_hi, reps_lo):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def chained(r):
        def fn(c, a):
            return lax.fori_loop(0, r, lambda i, x: step(x, a), c)

        return jax.jit(fn)

    hi, lo = chained(reps_hi), chained(reps_lo)

    def timed(fn):
        t0 = time.perf_counter()
        out = fn(cur0, aux)
        _ = np.asarray(out[(0,) * out.ndim])  # forced readback
        return time.perf_counter() - t0

    for fn in (lo, hi):  # warm both programs
        out = fn(cur0, aux)
        _ = np.asarray(out[(0,) * out.ndim])
    t_lo = min(timed(lo), timed(lo))
    t_hi = min(timed(hi), timed(hi))
    return (t_hi - t_lo) / (reps_hi - reps_lo)


def main():
    # TPU default backend mirrors bench.py: pallas_mxu is fastest on the
    # chip; the CPU-subprocess setup and TROY_PEROP_CPU runs keep sixstep
    if os.environ.get("TROY_PEROP_CPU") != "1":
        os.environ.setdefault("TROY_NTT_BACKEND", "pallas_mxu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--scheme", default="bfv", choices=["bfv", "bgv", "ckks"])
    ap.add_argument("-n", "--poly-degree", type=int, default=8192)
    ap.add_argument("--q-bits", default=None)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--setup-only", action="store_true")
    args = ap.parse_args()
    args.qbits = ([int(b) for b in args.q_bits.split(",")]
                  if args.q_bits else [30] * 7)

    if os.environ.get("TROY_PEROP_ROLE") == "setup":
        setup_impl(args)
        return

    path = _setup_path(args)
    if not os.path.exists(path):
        _log("setup (cpu subprocess, cold cache)...")
        env = dict(os.environ, JAX_PLATFORMS="cpu", TROY_PEROP_ROLE="setup",
                   TROY_NTT_BACKEND="sixstep")
        subprocess.run([sys.executable, os.path.abspath(__file__)]
                       + sys.argv[1:], check=True, env=env,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    if args.setup_only:
        return

    import jax

    # TROY_PEROP_CPU=1 pins the CPU backend (the env var alone does not —
    # the axon plugin registers in every interpreter, CLAUDE.md pitfalls)
    cpu_mode = os.environ.get("TROY_PEROP_CPU") == "1"
    if cpu_mode:
        jax.config.update("jax_platforms", "cpu")
    try:
        # separate cache dirs: entries record target machine features and
        # mismatched AOT loads cost ~3 s each (CLAUDE.md)
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/troy_perop_cpu_cache" if cpu_mode else
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_ccache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    data = dict(np.load(path, allow_pickle=False))
    host = json.loads(bytes(data.pop("host_json")).decode())
    _log("building steps (host tables)...")
    steps, arrs = build_steps(args, data)
    dev = jax.devices()[0]
    _log(f"timing on {dev} (batch={args.batch})...")
    qb = ",".join(str(b) for b in args.qbits)
    print(f"### {args.scheme.upper()} n={args.poly_degree} q_bits={{{qb}}} "
          f"batch={args.batch}")
    print("| op | ms / batched step | us / ciphertext |")
    print("|---|---|---|")
    for name, t in sorted(host.items()):
        print(f"| {name} | {t * 1e3:.3f} (B=1) | {t * 1e6:.1f} |")
    cheap = {"negate", "add", "multiply_plain", "mod_switch_to_next",
             "rescale_to_next", "encode_simd (device)",
             "decode_simd (device)", "decrypt (device)"}
    for name, spec in steps.items():
        aux_key, step = spec[0], spec[1]
        cur_key = spec[2] if len(spec) > 2 else "d1"
        reps_hi = args.reps * (8 if name in cheap else 1)
        reps_lo = max(2, reps_hi // 5)
        dt = slope_time(step, jax.device_put(arrs[cur_key], dev),
                        jax.device_put(arrs[aux_key], dev), reps_hi, reps_lo)
        print(f"| {name} | {dt * 1e3:.3f} | {dt / args.batch * 1e6:.1f} |",
              flush=True)


if __name__ == "__main__":
    main()
