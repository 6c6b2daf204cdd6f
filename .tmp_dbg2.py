import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from tpualign.config import ScoringConfig
from tpualign.io.bdna import random_pair
from tpualign.ops import bitpal, oracle
from tpualign.parallel import bitpal_strips as bs
from tpualign.parallel.mesh import make_mesh

m, n, P, chunk, seed = 70, 80, 2, 16, 2
s1, s2 = random_pair(m, n, seed=seed)

# oracle full table to get true boundary h-deltas
def full_table(s1, s2):
    mm, nn = len(s1), len(s2)
    H = np.zeros((nn+1, mm+1), np.int64)
    H[0,:] = -np.arange(mm+1); H[:,0] = -np.arange(nn+1)
    for i in range(1, nn+1):
        for j in range(1, mm+1):
            s = 1 if s1[j-1]==s2[i-1] else 0
            H[i,j] = max(H[i-1,j-1]+s, H[i-1,j]-1, H[i,j-1]-1)
    return H
H = full_table(np.asarray(s1), np.asarray(s2))
print("true score", H[n, m], "oracle", oracle.score(s1, s2, ScoringConfig()))

nw = -(-n // 31); nwL = -(-nw // P)
brow = 31 * nwL   # chip boundary query row (bottom row of chip 0's band)
true_u = H[brow, 1:m+1] - H[brow, 0:m] + 1   # u = h+1 per column
print("nw", nw, "nwL", nwL, "boundary row", brow)
print("true u[:20]:", true_u[:20].tolist())

# chip 0 alone: single-chip bitpal on first band, tap tail via chunk_call chain
unroll = bitpal.UNROLL_INTERPRET
nwl, rows, delta, T, K = None, None, None, None, None
nw_, nw_local, rows, delta, T, K = bs._geometry(n, m, P, chunk, unroll)
print("rows", rows, "delta", delta, "T", T, "K", K)
q0 = np.asarray(s2)[:brow]
eq0 = bitpal._eq_planes(jnp.asarray(q0, jnp.int32), brow, nwL, rows)
text_packed = bs._pack_text_chunks(jnp.asarray(np.asarray(s1), jnp.int32), m, T, K)
state = bitpal.init_chunk_state(rows)
r_star = (nwL-1) % rows; l_star = (nwL-1)//rows
tails = []
for q in range(K):
    ustream = jnp.zeros(T//16, jnp.int32)
    state, tail = bitpal.chunk_call(
        jnp.asarray([q*T], jnp.int32), text_packed[q], ustream, eq0, state,
        mt=m, rows=rows, t_steps=T, r_star=r_star, interpret=True)
    tails.append(np.asarray(tail)[:, l_star] & 3)
tails = np.concatenate(tails)   # per local step D'=1..K*T: tp of word nwL-1
# word nwL-1 column at step D' is D' - delta -> u for column j at index j+delta-1
got_u = tails[delta:delta+m]
print("got  u[:20]:", got_u[:20].tolist())
print("tail stream match:", np.array_equal(got_u, true_u))

# consumer alone: chip 1's band with the TRUE u-stream
q1 = np.asarray(s2)[brow:]
nq1 = len(q1)   # 80-62 = 18 -> 1 word
eq1 = bitpal._eq_planes(jnp.asarray(q1, jnp.int32), nq1, nwL, rows)
state1 = bitpal.init_chunk_state(rows)
ustream_full = np.zeros(K*T, np.int64)
ustream_full[:m] = true_u   # consumer local step dl -> column dl -> index dl-1
for q in range(K):
    us = bs._pack2(jnp.asarray(ustream_full[q*T:(q+1)*T], jnp.int32))
    state1, _ = bitpal.chunk_call(
        jnp.asarray([q*T], jnp.int32), text_packed[q], us, eq1, state1,
        mt=m, rows=rows, t_steps=T, r_star=r_star, interpret=True)
# score = -m + sum over ALL query rows of final-column v
def band_sum(state, nq_band):
    vm1, v0, v1, v2 = [np.asarray(x) for x in state[:4]]
    tot = 0
    for w in range(-(-nq_band//31)):
        r, l = w % rows, w // rows
        bits = min(31, nq_band - 31*w)
        mask = (1 << bits) - 1
        tot += bin(v1[r,l] & mask).count('1') + 2*bin(v2[r,l] & mask).count('1') - bin(vm1[r,l] & mask).count('1')
    return tot
tot = band_sum(state, brow) + band_sum(state1, nq1)
print("consumer-fed score:", -m + tot, "want", H[n, m])

# manual 2-chip pipeline exactly mirroring _pipeline_body
print("=== manual pipeline ===")
states = [bitpal.init_chunk_state(rows), bitpal.init_chunk_state(rows)]
eqs = [eq0, eq1]
prev1 = [np.zeros(T, np.int64), np.zeros(T, np.int64)]
prev2 = [np.zeros(T, np.int64), np.zeros(T, np.int64)]
S = K + 2*(P-1)
used_streams = {1: []}
for s in range(S):
    outs = []
    for c in range(P):
        q = s - 2*c
        active = 0 <= q < K
        qc = int(np.clip(q, 0, K-1))
        spliced = np.concatenate([prev2[c][delta:], prev1[c][:delta]])
        if c == 0:
            spliced = np.zeros(T, np.int64)
        if c == 1 and active:
            used_streams[1].append((q, spliced.copy()))
        us = bs._pack2(jnp.asarray(spliced, jnp.int32))
        new_state, tail = bitpal.chunk_call(
            jnp.asarray([qc*T], jnp.int32), text_packed[qc], us, eqs[c], states[c],
            mt=m, rows=rows, t_steps=T, r_star=r_star, interpret=True)
        if active:
            states[c] = new_state
        outs.append(np.asarray(tail)[:, l_star] & 3)
    for c in range(P):
        prev2[c] = prev1[c]
        prev1[c] = outs[c-1] if c > 0 else np.zeros(T, np.int64)
tot = band_sum(states[0], brow) + band_sum(states[1], nq1)
print("manual pipeline score:", -m + tot, "want", H[n, m])
for q, st in used_streams[1]:
    want = ustream_full[q*T:(q+1)*T]
    if not np.array_equal(st, want):
        bad = np.nonzero(st != want)[0]
        print(f"chunk {q}: stream mismatch at {bad[:6]} got {st[bad[:6]]} want {want[bad[:6]]}")
    else:
        print(f"chunk {q}: stream ok")

# shard_map version, but return per-chip parts (no psum)
import functools
import jax.numpy as jnp
from tpualign.parallel.mesh import AXIS
LANES = 128
cfg = ScoringConfig()

def dbg_body(eq_local, text_packed_):
    Pn = jax.lax.axis_size(AXIS)
    c = jax.lax.axis_index(AXIS)
    eq_planes = eq_local[0]
    rs = (nwL - 1) % rows
    ls = (nwL - 1) // rows
    def superstep(carry, s):
        state, p1, p2 = carry
        q = s - 2 * c
        active = (q >= 0) & (q < K)
        qc = jnp.clip(q, 0, K - 1)
        d0 = (qc * T).reshape(1)
        tchunk = jax.lax.dynamic_slice(text_packed_, (qc, 0), (1, T // 8))[0]
        spliced = jnp.concatenate([p2[delta:], p1[:delta]])
        packed = bs._pack2(spliced)
        ustream = jnp.where(c == 0, jnp.zeros_like(packed), packed)
        new_state, tail = bitpal.chunk_call(
            d0.astype(jnp.int32), tchunk, ustream, eq_planes, state,
            mt=m, rows=rows, t_steps=T, r_star=rs, interpret=True)
        state = tuple(jnp.where(active, ns, os) for ns, os in zip(new_state, state))
        out_vals = tail[:, ls] & 3
        perm = [(i, i + 1) for i in range(Pn - 1)]
        received = jax.lax.ppermute(out_vals, AXIS, perm)
        return (state, received, p1), None
    init_state = bitpal.init_chunk_state(rows)
    z = jnp.zeros(T, jnp.int32)
    steps = jnp.arange(K + 2 * (P - 1), dtype=jnp.int32)
    (state, _, _), _ = jax.lax.scan(superstep, (init_state, z, z), steps)
    # return raw planes for inspection
    return jnp.stack([state[0], state[2], state[3]])[None]  # vm1, v1, v2

mesh = make_mesh(P)
Spec = jax.sharding.PartitionSpec
sharded = jax.shard_map(dbg_body, mesh=mesh, in_specs=(Spec(AXIS), Spec()),
                        out_specs=Spec(AXIS), check_vma=False)
eq_all = bs._eq_planes_sharded(jnp.asarray(np.asarray(s2), jnp.int32), n, nw, nwL, rows, P)
planes = np.asarray(sharded(eq_all, text_packed))  # (P, 3, rows, LANES)
def band_sum2(vm1, v1, v2, nq_band):
    tot = 0
    for w in range(-(-nq_band // 31)):
        r, l = w % rows, w // rows
        bits = min(31, nq_band - 31 * w)
        mask = (1 << bits) - 1
        tot += bin(int(v1[r,l]) & mask).count('1') + 2*bin(int(v2[r,l]) & mask).count('1') - bin(int(vm1[r,l]) & mask).count('1')
    return tot
p0 = band_sum2(*planes[0], brow)
p1v = band_sum2(*planes[1], nq1)
print("chip0 part:", p0, "expected:", band_sum(states[0], brow))
print("chip1 part:", p1v, "expected:", band_sum(states[1], nq1))

print("=== production ===")
got = bs.score(s1, s2, ScoringConfig(), mesh=make_mesh(2), chunk_cols=16, interpret=True)
print("production score:", got, "want", H[n, m])
# isolate the reduction: production body but returning part per chip
def dbg_body2(eq_local, text_packed_):
    c = jax.lax.axis_index(AXIS)
    out = dbg_body(eq_local, text_packed_)  # (1, 3, rows, LANES) correct planes
    vm1, v1, v2 = out[0, 0], out[0, 1], out[0, 2]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    gword = c * nwL + row_i + rows * lane_i
    nbits = jnp.clip(n - 31 * gword, 0, 31)
    valid = jnp.where(nbits >= 31, jnp.int32((1 << 31) - 1), (jnp.int32(1) << nbits) - 1)
    pc = lambda x: jnp.sum(jax.lax.population_count(x & valid))
    part = pc(v1) + 2 * pc(v2) - pc(vm1)
    return part[None]
sh2 = jax.shard_map(dbg_body2, mesh=make_mesh(2), in_specs=(Spec(AXIS), Spec()),
                    out_specs=Spec(AXIS), check_vma=False)
parts = np.asarray(sh2(eq_all, text_packed))
print("parts via production reduce:", parts, "expected [91, 4]")
