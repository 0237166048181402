"""Full wq2 driver body cost on TPU: kernel + deposit + stall resolution."""
import functools, time
import jax, jax.numpy as jnp
from path_tracer_tpu.scene.presets import build_final_scene
from path_tracer_tpu.ops.pallas import wave_bounce as WB, wq_kernel as WQ
from path_tracer_tpu.engine.wq2 import _zeros_state, _round_up, pick_chunk, LANE

W,H,SPP,D = 800,600,80,50
TILE=32
scene, cam = build_final_scene(W/H)
n_pix=W*H; C=pick_chunk(SPP); cpp=SPP//C
lanes=_round_up(n_pix, TILE*LANE); rows=lanes//LANE
sh=(rows,LANE); f32=jnp.float32
tables = WB.pack_scene(scene)._replace(cam=WB.pack_camera(cam,W,H), seed=jnp.zeros(1,jnp.uint32))
atlas = scene.textures.atlas; n_atlas=atlas.shape[0]
a32=atlas.astype(jnp.uint32); atlas_u32=a32[:,0]|(a32[:,1]<<8)|(a32[:,2]<<16)
call = functools.partial(WQ.wq_call, t_min=1e-3, max_depth=D, attenuate=False,
                         n_bounce=C, chunk=C, cpp=cpp, tile_rows=TILE, interpret=False)

def texf(pf):
    idx = jnp.clip(pf.astype(jnp.int32)-1, 0, n_atlas-1)
    t = atlas_u32[idx.reshape(-1)].reshape(sh)
    has = pf>0
    s=jnp.float32(1/255.)
    return (jnp.where(has,(t&0xFF).astype(f32)*s,1.),
            jnp.where(has,((t>>8)&0xFF).astype(f32)*s,1.),
            jnp.where(has,((t>>16)&0xFF).astype(f32)*s,1.))

def make(variant):
    @jax.jit
    def f(st, qs, fbr, fbg, fbb):
        def body(i, c):
            st, qs, fbr, fbg, fbb = c
            out = call(tables, st, qs)
            st, qs = out.state, out.qstate
            if variant in ("deposit","full"):
                di = jnp.where(out.dpix >= 0.0, out.dpix, f32(n_pix)).astype(jnp.int32).reshape(-1)
                fbr = fbr.at[di].add(out.dr.reshape(-1), mode="drop")
                fbg = fbg.at[di].add(out.dg.reshape(-1), mode="drop")
                fbb = fbb.at[di].add(out.db.reshape(-1), mode="drop")
            if variant in ("stall","full"):
                f1,f2,f3 = texf(st.pf1),texf(st.pf2),texf(st.pf3)
                pr,pg,pb = f1[0]*f2[0]*f3[0], f1[1]*f2[1]*f3[1], f1[2]*f2[2]*f3[2]
                is1=st.stall==1.; is2=st.stall==2.
                st = st._replace(
                    accx=jnp.where(is1, st.accx+st.trx*pr, st.accx),
                    accy=jnp.where(is1, st.accy+st.tr_y*pg, st.accy),
                    accz=jnp.where(is1, st.accz+st.trz*pb, st.accz),
                    tpx=jnp.where(is2, st.tpx*pr, st.tpx),
                    tpy=jnp.where(is2, st.tpy*pg, st.tpy),
                    tpz=jnp.where(is2, st.tpz*pb, st.tpz),
                    pf1=jnp.where(st.stall!=0.,0.,st.pf1),
                    pf2=jnp.where(st.stall!=0.,0.,st.pf2),
                    pf3=jnp.where(st.stall!=0.,0.,st.pf3),
                    stall=jnp.zeros_like(st.stall))
            return st, qs, fbr, fbg, fbb
        return jax.lax.fori_loop(0, 4, body, (st, qs, fbr, fbg, fbb))
    return f

st0 = _zeros_state(rows)
qs0 = jnp.array([0,0,n_pix*cpp,0], jnp.int32)
fb0 = jnp.zeros((n_pix+1,), f32)

def bench(fn,*a):
    r=fn(*a); jax.block_until_ready(r[1])
    best=1e9
    for _ in range(2):
        t0=time.perf_counter(); r=fn(*a); jax.block_until_ready(r[1])
        best=min(best,time.perf_counter()-t0)
    return best/4

import sys
for v in sys.argv[1:] or ["kernel-only","deposit","stall","full"]:
    t=bench(make(v), st0, qs0, fb0, fb0, fb0)
    print(f"variant '{v}': {t*1e3:.1f} ms/call ({t*1e3/C:.2f} ms/bounce)", flush=True)
