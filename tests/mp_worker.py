"""Worker process for the real 2-process jax.distributed test
(tests/test_multiprocess.py runs two of these).  Brings up the distributed
runtime, builds the global (tiles, spp) mesh across BOTH processes, renders
THREE_SPHERES through the production work-queue megakernel under shard_map,
assembles the cross-process image, and checks it against a process-local
full-frame ground-truth render.

Usage: python tests/mp_worker.py <coordinator_port> <process_id> <out_dir>
(env must pin JAX_PLATFORMS=cpu and 4 virtual devices per process; the
parent test sets this).
"""
import pathlib
import sys


def main() -> None:
    port, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    # bring_up FIRST — before any jax backend query (multihost.bring_up
    # docstring)
    from path_tracer_tpu.parallel.multihost import (assemble_image, bring_up,
                                                    global_mesh)
    bring_up(coordinator=f"localhost:{port}", num_processes=2,
             process_id=pid)

    import jax
    import numpy as np

    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    from path_tracer_tpu.engine.integrator import render_wavefront
    from path_tracer_tpu.parallel.mesh import render_sharded
    from path_tracer_tpu.scene.presets import THREE_SPHERES

    w, h, spp, depth = 16, 8, 8, 3
    scene, cam = THREE_SPHERES.build()
    # numpy-hosted pytrees are identical on every process, so jit treats
    # them as fully-replicated global inputs
    scene = jax.tree.map(np.asarray, scene)
    cam = jax.tree.map(np.asarray, cam)

    mesh = global_mesh(n_spp=2)           # (4 tiles x 2 spp) across procs
    assert mesh.shape == {"tiles": 4, "spp": 2}

    img = render_sharded(scene, cam, w, h, spp, mesh, max_depth=depth,
                         renderer="wq", window=2, interpret=True,
                         tile_rows=8)
    full = assemble_image(img)            # the only cross-host gather
    assert full.shape == (h, w, 3)

    ref = np.asarray(render_wavefront(scene, cam, w, h, spp,
                                      max_depth=depth))
    maxdiff = float(np.abs(full - ref).max())

    out = pathlib.Path(out_dir) / f"p{pid}.txt"
    out.write_text(f"OK {maxdiff:.8f}\n")
    print(f"worker {pid}: maxdiff={maxdiff:.8f}", flush=True)


if __name__ == "__main__":
    main()
