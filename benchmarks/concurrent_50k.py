"""Round-5 flagship measurements on one chip (VERDICT r5 items 1c, 2, 3).

1. n=50,000 anchor (padded 50,176) x m=65,536: per-iteration cost of the
   exact sweep now that the int8-resident transposed kernel covers n=50k
   (VMEM budget raised to the chip's real 128 MiB — X crosses HBM ONCE per
   iteration instead of twice, VERDICT item 3; target <= 16 ms/iter).
2. Concurrent-shard schedule, single-chip EMULATION with S=8 virtual shards
   (same Markov kernel as the 8-chip distributed run): the emulation runs
   the 8 shard-group sweeps sequentially, so
       t_iter(8 chips) ~= t_emu / 8 + Rm * t_psum + merge overhead
   and t_emu itself vs the exact sweep quantifies the schedule overhead.
3. Prints the revised 50k x 500k x 50k-iteration BayesR wall-clock
   projection for an 8-chip v5e slice under the concurrent schedule.

Usage: python benchmarks/concurrent_50k.py [quick]
"""

import dataclasses
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from hibayes_tpu.engine import gibbs as G


def _sim_geno(rng, n, m, maf=0.3):
    p0 = (1 - maf) ** 2
    p1 = 2 * maf * (1 - maf)
    raw = rng.integers(0, 256, size=(n, m), dtype=np.uint8)
    out = np.ones((n, m), dtype=np.int8)
    out[raw < int(p0 * 256)] = 0
    out[raw >= int((p0 + p1) * 256)] = 2
    return out


def build(n, m, block, model, nblocks_multiple=1):
    rng = np.random.default_rng(0)
    M = _sim_geno(rng, n, m)
    b = rng.normal(0, 0.05, m).astype(np.float32)
    y = rng.normal(0, 1, n).astype(np.float32)
    for j0 in range(0, m, 8192):
        y += M[:, j0:j0 + 8192].astype(np.float32) @ b[j0:j0 + 8192]
    if model == "BayesR":
        pi = np.array([0.95, 0.02, 0.02, 0.01])
        fold = np.array([0.0, 1e-4, 1e-3, 1e-2])
    else:
        pi, fold = np.array([0.95, 0.05]), None
    data = G.prepare_gibbs_data(y, M, block=block, dtype=jnp.float32,
                                geno_dtype="int8", fold=fold,
                                nblocks_multiple=nblocks_multiple)
    pr = G.resolve_priors(y, float(np.asarray(data.vx).sum()), pi[0], nr=0)
    spec = G.GibbsSpec(
        model=model, n=int(data.y.shape[0]), n_real=n,
        m=m, m_pad=int(data.xpx.shape[0]), block=block,
        nc=0, nlevels=(), n_fold=len(pi), niter=100, nburn=50, thin=5,
        nvar0=int((np.asarray(data.vx)[:m] == 0).sum()),
        dfvara=pr.dfvara, s2vara=pr.s2vara, dfvare=pr.dfvare, s2vare=pr.s2vare,
        s2varg=pr.s2varg, lambda_rate0=pr.lambda_rate0,
        use_pallas=jax.default_backend() != "cpu",
    )
    return data, spec, pr, pi


def time_step(spec, data, pr, pi, iters=20):
    st0 = G.init_state(spec, data, pr, pi)
    key = jax.random.PRNGKey(1)
    step = jax.jit(partial(G.one_iteration, spec))
    st = jax.block_until_ready(step(data, key, st0))
    st = jax.block_until_ready(step(data, key, st))
    t0 = time.time()
    for _ in range(iters):
        st = step(data, key, st)
    jax.block_until_ready(st)
    return (time.time() - t0) / iters


def time_step_batch(spec, data, pr, pi, K, iters=20):
    st0 = G.init_state(spec, data, pr, pi)
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (K,) + x.shape), st0)
    keys = jax.random.split(jax.random.PRNGKey(1), K)
    step = jax.jit(partial(G.one_iteration_batch, spec))
    st = jax.block_until_ready(step(data, keys, states))
    st = jax.block_until_ready(step(data, keys, st))
    t0 = time.time()
    for _ in range(iters):
        st = step(data, keys, st)
    jax.block_until_ready(st)
    return (time.time() - t0) / iters


def main():
    quick = "quick" in sys.argv
    iters = 10 if quick else 30
    n, m = 50_000, 65_536
    print(f"backend={jax.default_backend()}  n={n} m={m}")

    for model in (["BayesR"] if quick else ["BayesCpi", "BayesR"]):
        # exact unsharded sweep (kernel auto-selection)
        data, spec, pr, pi = build(n, m, 128, model)
        from hibayes_tpu.ops import blockgibbs as BG
        sel = G._select_sweep_mc(spec, spec.n, 1, jnp.float32, 1, False)
        t_x = time_step(spec, data, pr, pi, iters)
        print(f"{model}: exact unsharded {t_x*1e3:.1f} ms/iter "
              f"({m/t_x/1e6:.2f}M upd/s, {t_x/ (spec.nblocks)*1e6:.1f} us/block, "
              f"kernel={getattr(sel, 'func', sel)})", flush=True)

        # concurrent emulation S=8 (what each of 8 chips would sweep)
        for Rm in ([1] if quick else [1, 2]):
            data_c, spec_c, pr_c, pi_c = build(n, m, 128, model,
                                               nblocks_multiple=8 * Rm)
            spec_c = dataclasses.replace(
                spec_c, shard_schedule="concurrent", emulate_shards=8,
                merge_rounds=Rm)
            t_e = time_step(spec_c, data_c, pr_c, pi_c, iters)
            t_chip = t_e / 8
            print(f"{model}: concurrent emu S=8 Rm={Rm} {t_e*1e3:.1f} ms/iter "
                  f"(= {t_chip*1e3:.2f} ms/chip-iter; overhead vs exact "
                  f"{t_e/t_x:.3f}x)", flush=True)
            del data_c  # free the 3.2 GB genotype before the next build

        # ring-pipelined EXACT schedule, single-chip EMULATION: K chains in
        # S=8 groups; the emulation runs the S x S (group, turn) sweeps
        # sequentially, so t_iter(8 chips) ~= t_emu / 8 + ppermute.  Every
        # chain is an exact Gibbs scan (rotated block order).
        for Kp in ([8] if quick else [8, 64]):
            data_p, spec_p, pr_p, pi_p = build(n, m, 128, model,
                                               nblocks_multiple=8)
            spec_p = dataclasses.replace(
                spec_p, shard_schedule="pipeline", emulate_shards=8)
            t_p = time_step_batch(spec_p, data_p, pr_p, pi_p, Kp, iters)
            t_wall = t_p / 8
            agg = Kp * m / t_wall
            print(f"{model}: pipeline emu S=8 K={Kp} {t_p*1e3:.1f} ms/iter "
                  f"(= {t_wall*1e3:.2f} ms wall/iter on 8 chips for {Kp} "
                  f"exact chains; {agg/1e6:.0f}M agg upd/s)", flush=True)
            nb_f = -(-500_000 // 128 // 8) * 8
            t_flag = t_wall * nb_f / spec_p.nblocks + 0.0005
            print(f"{model}: 50k x 500k pipeline projection (8 chips, "
                  f"{Kp} exact chains): {t_flag*1e3:.1f} ms/iter -> "
                  f"50k iters = {t_flag*50_000/60:.0f} min wall "
                  f"({Kp} chains together)", flush=True)
            del data_p

        # distributed concurrent path at S=1 (one chip, real shard_map +
        # psum structure): quantifies the schedule's multiplicative overhead
        from hibayes_tpu.parallel.mesh import (
            make_mesh, shard_gibbs_data, shard_state)

        mesh = make_mesh(1, shape=(1, 1))
        spec_s1 = dataclasses.replace(spec, shard_schedule="concurrent",
                                      merge_rounds=1)
        data_s = shard_gibbs_data(data, mesh)
        st_s = shard_state(G.init_state(spec_s1, data, pr, pi), mesh)
        key = jax.random.PRNGKey(1)
        with mesh:
            # data passed as a jit ARGUMENT: a closure would bake the 3.2 GB
            # genotype into the HLO as a captured constant (slow lowering)
            step_s = jax.jit(lambda dd, st: G.one_iteration(spec_s1, dd, key,
                                                            st, mesh=mesh))
            st = jax.block_until_ready(step_s(data_s, st_s))
            st = jax.block_until_ready(step_s(data_s, st))
            t0 = time.time()
            for _ in range(iters):
                st = step_s(data_s, st)
            jax.block_until_ready(st)
            t_s1 = (time.time() - t0) / iters
        ratio = t_s1 / t_x
        print(f"{model}: distributed concurrent path S=1 {t_s1*1e3:.1f} "
              f"ms/iter (shard_map overhead {ratio:.3f}x)", flush=True)

        # projection: 500k SNPs over 8 chips, concurrent schedule — scale
        # the measured per-block cost by the shard_map overhead ratio and
        # add the per-group fixed cost seen in the emulation
        nb_flag = -(-500_000 // 128 // 8) * 8          # blocks, padded to 8
        per_block = t_x / spec.nblocks
        grp_over = max(t_e - t_x, 0.0) / 8             # per-group fixed cost
        t_iter = ratio * per_block * nb_flag / 8 + grp_over + 0.0002
        print(f"{model}: 50k x 500k projection (8 chips, concurrent): "
              f"{t_iter*1e3:.1f} ms/iter -> 50k iters = "
              f"{t_iter*50_000/60:.1f} min", flush=True)
        del data, data_s, st_s, st  # free before the next model / block scan

    if not quick:
        # block-size scan at the anchor (mc_t reaches B=256 in 96MB VMEM)
        for Bb in (64, 256):
            data_b, spec_b, pr_b, pi_b = build(n, m, Bb, "BayesR")
            t_b = time_step(spec_b, data_b, pr_b, pi_b, iters)
            print(f"BayesR block={Bb}: {t_b*1e3:.1f} ms/iter "
                  f"({m/t_b/1e6:.2f}M upd/s)", flush=True)
            del data_b


if __name__ == "__main__":
    main()
