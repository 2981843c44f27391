"""Op-level profile report for a captured jax.profiler trace — no
TensorBoard needed (the installed tensorboard_plugin_profile wheel is
incompatible with this TF, so we parse the xplane.pb directly).

Usage:
  python scripts/profile_report.py <trace_dir_or_xplane.pb>
      parse an existing capture (e.g. from SSV_TPU_PROFILE_DIR=<dir>
      python main.py ... — the Trainer traces one steady-state epoch)

  python scripts/profile_report.py --capture [batch]
      capture a 100-step SimCLR epoch on the current backend first, then
      report (writes the trace under /tmp/ssv_profile)

Reports, for the device plane: wall time, synchronous-compute duty cycle,
and the busy-time breakdown by HLO category (async copy/slice ops and the
`while` wrapper are excluded — their spans overlap real compute).

The round-2 SimCLR/v5e capture (VALIDATION.md): 91% duty; convolution
fusions 65.6% of wall, loop fusions (augmentation+BN+optimizer) 13.5%,
select-and-scatter (max-pool backward) 6.6%.
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

ASYNC = {"copy-start", "async-start", "copy-done", "async-done", "while", "?"}


def find_xplane(path: str) -> str:
    if path.endswith(".pb"):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        raise FileNotFoundError(f"no *.xplane.pb under {path}")
    return hits[-1]


def report(xplane_path: str) -> dict:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        xs.ParseFromString(f.read())
    device_planes = [p for p in xs.planes
                     if "/device:" in p.name and "CUSTOM" not in p.name
                     and any(len(l.events) for l in p.lines)]
    if not device_planes:
        raise RuntimeError(f"no device plane with events in {xplane_path}")
    pl = device_planes[0]
    md, smd = pl.event_metadata, pl.stat_metadata
    lines = [l for l in pl.lines if l.name == "XLA Ops"] or pl.lines

    cat_time: dict = defaultdict(int)
    t0, t1 = None, None
    for line in lines:
        for ev in line.events:
            end = ev.offset_ps + ev.duration_ps
            t0 = ev.offset_ps if t0 is None else min(t0, ev.offset_ps)
            t1 = end if t1 is None else max(t1, end)
            cat = None
            for st in list(ev.stats) + list(md[ev.metadata_id].stats):
                if smd[st.metadata_id].name in ("hlo_category", "category"):
                    cat = st.str_value or st.ref_value
            if isinstance(cat, int) and cat:
                cat = smd[cat].name
            cat = cat or "?"
            if cat not in ASYNC:
                cat_time[cat] += ev.duration_ps

    wall_ms = (t1 - t0) / 1e12 * 1000
    sync_ms = sum(cat_time.values()) / 1e12 * 1000
    print(f"device plane: {pl.name}")
    print(f"trace wall {wall_ms:,.1f} ms | synchronous compute "
          f"{sync_ms:,.1f} ms ({sync_ms / wall_ms:.0%} duty)")
    for c, t in sorted(cat_time.items(), key=lambda kv: -kv[1]):
        ms = t / 1e12 * 1000
        print(f"  {c:28s} {ms:9.1f} ms  {ms / sync_ms:6.1%} of compute  "
              f"{ms / wall_ms:6.1%} of wall")
    return {"wall_ms": wall_ms, "sync_ms": sync_ms,
            "categories": {c: t / 1e12 * 1000 for c, t in cat_time.items()}}


def capture(batch: int) -> str:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _mini_simclr
    from ssv_tpu.data.augment import build_transform

    steps, n = 100, max(8192, batch * 4)
    algo, transforms = _mini_simclr(batch_size=batch, n_train=n)
    train_t = build_transform(transforms["train"])
    images = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (n, 32, 32, 3), dtype=np.uint8))
    state = algo.init_state(jax.random.PRNGKey(0))

    def train_step(state, idx, key):
        raw = jnp.take(images, idx, axis=0)
        k1, k2, ka = jax.random.split(key, 3)
        batch_d = {"index": idx, "img": raw.astype(jnp.float32) / 255.0,
                   "aug_1": jax.vmap(train_t)(jax.random.split(k1, batch), raw),
                   "aug_2": jax.vmap(train_t)(jax.random.split(k2, batch), raw),
                   "label": jnp.zeros((batch,), jnp.int32)}
        return algo.train_step(state, batch_d, ka)

    def epoch(state, idx_mat, key):
        keys = jax.random.split(key, idx_mat.shape[0])

        def body(st, inp):
            st, m = train_step(st, *inp)
            return st, m["loss"]

        return jax.lax.scan(body, state, (idx_mat, keys))

    jepoch = jax.jit(epoch)
    idx_mat = (jnp.arange(steps * batch, dtype=jnp.int32) % n).reshape(steps, batch)
    st, losses = jepoch(state, idx_mat, jax.random.PRNGKey(0))
    float(losses[-1])  # compile + warm
    out = "/tmp/ssv_profile"
    jax.profiler.start_trace(out)
    st, losses = jepoch(st, idx_mat, jax.random.PRNGKey(1))
    float(losses[-1])
    jax.profiler.stop_trace()
    return out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--capture" in sys.argv:
        path = capture(int(args[0]) if args else 512)
    elif args:
        path = args[0]
    else:
        print(__doc__)
        sys.exit(2)
    report(find_xplane(path))


if __name__ == "__main__":
    main()
