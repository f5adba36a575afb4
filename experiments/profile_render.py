#!/usr/bin/env python
"""Profile the steady-state (warm) test renderer on the real chip.

Trains briefly so the occupancy grid is representative, renders once to
compile the bucket-round ladder, then captures a jax profiler trace of
the warm render — the regime `validate()` runs in during a sweep.
Parse with experiments/xplane_top.py.
"""
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax

    sys.path.insert(0, "/root/repo")
    from bench import build_trainer, run_steps, sync

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    trainer, cfg = build_trainer(8192, sv_intervals=24,
                                 hash_layout="triplane")
    trainer.mark_invisible_cells()
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    sync(run_steps(trainer, cfg, n_steps))
    scene = trainer.scene_test
    poses = list(scene.poses)
    t0 = time.perf_counter()
    trainer.render_images(poses)
    print(f"cold render {time.perf_counter() - t0:.2f}s", file=sys.stderr)
    t0 = time.perf_counter()
    trainer.render_images(poses)
    warm = time.perf_counter() - t0
    n_px = scene.n_images * scene.img_wh[0] * scene.img_wh[1]
    print(f"warm render {warm:.2f}s = {n_px / warm:,.0f} rays/s",
          file=sys.stderr)
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_render"
    jax.profiler.start_trace(out)
    t0 = time.perf_counter()
    trainer.render_images(poses)
    warm = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced render {warm:.2f}s -> {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
