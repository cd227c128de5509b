"""Command-line driver — the headless analog of the reference's app loop.

The reference's entry point opens a window and drives winit events into
the renderer (``src/lib.rs:42-171``); on a TPU host the equivalents are:

    simulate  — run a rollout, print per-frame stats, optionally save
                fields / a checkpoint (the frame loop)
    bench     — measure steps/sec (the title-bar ms, done honestly)
    synth     — generate initial conditions from wind parameters and save
                them in the reference's bincode format (the missing
                offline asset generator, SURVEY.md §3.4)
    render    — rasterize frames along a scripted camera to .npy/.png
    query     — water height/normal at world points (buoy sampling)
    info      — show config, devices, asset stats

Every GLSL literal of the reference is a flag here (SURVEY.md §5 config).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--domain-size", type=float, default=1000.0)
    p.add_argument("--fft-impl", choices=("matmul", "xla", "pallas"), default="matmul")
    p.add_argument("--precision",
                   choices=("bf16x3", "bf16x4", "highest", "high", "default"),
                   default="bf16x3",
                   help="matmul precision tier. NOTE: the explicit-split "
                        "bf16x3/bf16x4 tiers run as written only in the "
                        "direct-DFT regime (resolution <= 1024) and inside "
                        "the Pallas kernels; the four-step einsum stages "
                        "above that remap them to XLA HIGH/HIGHEST (the "
                        "split's barriers cost 2.4x there). `bench` reports "
                        "the tier that actually ran as "
                        "'effective_precision'.")
    p.add_argument("--cascades", type=int, default=1)
    p.add_argument("--pack", dest="pack", action="store_true", default=None,
                   help="Hermitian field packing (3 fields from 2 transforms); "
                        "default: auto (on for resolution >= 1024)")
    p.add_argument("--no-pack", dest="pack", action="store_false")
    p.add_argument("--normals", action="store_true", default=True)
    p.add_argument("--no-normals", dest="normals", action="store_false")
    p.add_argument("--foam", action="store_true")
    p.add_argument("--compat-wrap-k", action="store_true",
                   help="replicate the reference's uint32 wavenumber wrap (Q1)")
    p.add_argument("--canonical-sign", action="store_true",
                   help="use the canonical (-1)^(x+y) instead of the reference's flip (Q2)")
    p.add_argument("--conj-neg", action="store_true",
                   help="canonical Tessendorf conjugate pairing instead of the reference's")
    p.add_argument("--frag-normal-x", action="store_true",
                   help="replicate the reference frag's .x normal taps — the "
                        "disp_x channel, a reference bug (Q8); default taps height")
    p.add_argument("--pbr-roughness", type=float, default=0.0,
                   help="> 0 adds the opt-in Cook-Torrance specular lobe "
                        "built from the reference's defined-but-unused GGX "
                        "helpers (ocean.frag:32-47); 0 = reference shading")
    p.add_argument("--spectrum", type=str, default=None, help="path to spectrum.bin")
    p.add_argument("--omega", type=str, default=None, help="path to omega.bin")
    p.add_argument("--phillips", action="store_true",
                   help="synthesize initial conditions instead of loading assets")
    p.add_argument("--wind-speed", type=float, default=31.0)
    p.add_argument("--wind-dir", type=float, nargs=2, default=(1.0, 0.0))
    p.add_argument("--amplitude", type=float, default=3.0e-7)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--spectrum-model", choices=("phillips", "jonswap"),
                   default="phillips",
                   help="synthesis spectrum: classic Phillips, or the "
                        "fetch-limited JONSWAP (Hasselmann et al. 1973), "
                        "peak-normalized to the Phillips scale")
    p.add_argument("--fetch", type=float, default=None,
                   help="JONSWAP fetch length in meters (default 5e5)")
    p.add_argument("--peak-enhancement", type=float, default=None,
                   help="JONSWAP gamma (1.0 = Pierson-Moskowitz shape; "
                        "default 3.3)")
    p.add_argument("--depth", type=float, default=float("inf"),
                   help="water depth in meters: finite values use the "
                        "finite-depth dispersion w = sqrt(g k tanh(k h)) "
                        "(long waves slow down) and make the jonswap "
                        "model the TMA spectrum; default deep water")
    p.add_argument("--opposing-suppression", type=float, default=1.0,
                   help="multiplier in [0, 1] on spectrum energy for "
                        "waves moving against the wind (1 = classic "
                        "symmetric |k.w|^p, 0 = upwind waves removed)")
    p.add_argument("--mesh", type=str, default=None, metavar="BATCH,ROW",
                   help="run on a (batch, row) device mesh, e.g. --mesh 2,4. "
                        "simulate/bench/serve: 'batch' data-parallels "
                        "cascades/patches, 'row' shards grid rows "
                        "(distributed FFT over ICI). render: 'batch' "
                        "data-parallels FRAMES and 'row' splits the "
                        "viewport into horizontal bands (row must divide "
                        "--height); serve renders in viewport bands too "
                        "(row must divide the viewport height)")
    p.add_argument("--sharded-fft", choices=("gspmd", "shard_map"),
                   default="gspmd",
                   help="multi-chip FFT strategy: XLA-inserted collectives "
                        "(gspmd) or the explicit shard_map four-step")


def _build(args):
    from gfx_ocean_tpu import OceanConfig, CompatFlags, PhillipsConfig
    from gfx_ocean_tpu.models.ocean import (
        downsample_state, ocean_state_from_assets, ocean_state_from_phillips)

    config = OceanConfig(
        resolution=args.resolution,
        domain_size=args.domain_size,
        fft_impl=args.fft_impl,
        matmul_precision=args.precision,
        hermitian_pack=args.pack,
        num_cascades=args.cascades,
        compute_normals=args.normals,
        compute_foam=args.foam,
        pbr_roughness=args.pbr_roughness,
        compat=CompatFlags(
            wrap_k=args.compat_wrap_k,
            ref_sign=not args.canonical_sign,
            conj_neg=args.conj_neg,
            frag_normal_x=args.frag_normal_x,
        ),
    )
    # --fetch/--peak-enhancement default to None so the guards can tell
    # "user asked" from "dataclass default".
    jonswap_kw = {k: v for k, v in (("fetch", args.fetch),
                                    ("peak_enhancement",
                                     args.peak_enhancement)) if v is not None}
    if jonswap_kw and args.spectrum_model != "jonswap":
        # A Phillips sea would silently ignore them.
        raise SystemExit(
            f"--{'/--'.join(k.replace('_', '-') for k in jonswap_kw)} "
            "only apply to --spectrum-model jonswap")
    phillips = PhillipsConfig(
        amplitude=args.amplitude,
        wind_speed=args.wind_speed,
        wind_direction=tuple(args.wind_dir),
        seed=args.seed,
        model=args.spectrum_model,
        depth=args.depth,
        opposing_suppression=args.opposing_suppression,
        **jonswap_kw,
    )
    if args.phillips or args.cascades > 1:
        state = ocean_state_from_phillips(config, phillips)
    else:
        # (--fetch/--peak-enhancement without jonswap are rejected above.)
        if (args.spectrum_model != "phillips"
                or not np.isinf(args.depth)
                or args.opposing_suppression != 1.0):
            raise SystemExit("--spectrum-model/--depth/"
                             "--opposing-suppression only apply to "
                             "synthesized initial conditions; add "
                             "--phillips")
        state = ocean_state_from_assets(args.spectrum, args.omega, resolution=None)
        n = state.h0.shape[-1]
        if n != config.resolution:
            if config.resolution < n:
                state = downsample_state(state, config.resolution)
            else:
                raise SystemExit(f"assets are {n}^2; cannot upsample to "
                                 f"{config.resolution}^2 — use --phillips")
    return config, phillips, state


def _parse_mesh_arg(args):
    """``--mesh B,R`` -> (batch, row) ints, or None when not given."""
    if getattr(args, "mesh", None) is None:
        return None
    parts = args.mesh.split(",")
    if len(parts) != 2:
        raise SystemExit(f"--mesh wants BATCH,ROW (e.g. 2,4), got {args.mesh!r}")
    try:
        batch, row = int(parts[0]), int(parts[1])
    except ValueError:
        raise SystemExit(f"--mesh wants integers, got {args.mesh!r}") from None
    if batch < 1 or row < 1:
        raise SystemExit("--mesh axes must be >= 1")
    return batch, row


def _mesh_setup(args, config, state):
    """Build the device mesh and shard (tiling for DP if needed).

    Returns (mesh, state, batched). With ``batch > 1`` and an unbatched
    state, the state is tiled into ``batch`` independent patches — the
    multi-chip generalization of the reference's 4-instance patch draw
    (``src/render.rs:518-559``); with cascades, the cascade dim is the
    batch dim and must divide evenly.
    """
    import jax
    import jax.numpy as jnp

    from gfx_ocean_tpu.models.ocean import OceanState
    from gfx_ocean_tpu.parallel.sharding import make_mesh, shard_state

    batch, row = _parse_mesh_arg(args)
    n_dev = len(jax.devices())
    if batch * row > n_dev:
        raise SystemExit(f"--mesh {batch},{row} wants {batch * row} devices; "
                         f"only {n_dev} visible")
    mesh = make_mesh(jax.devices()[: batch * row], batch=batch, row=row)
    batched = state.h0.ndim == 4
    if batched:
        if state.h0.shape[0] % batch:
            raise SystemExit(f"{state.h0.shape[0]} cascades not divisible by "
                             f"mesh batch={batch}")
    elif batch > 1:
        state = OceanState(
            h0=jnp.broadcast_to(state.h0, (batch, *state.h0.shape)),
            omega=jnp.broadcast_to(state.omega, (batch, *state.omega.shape)))
        batched = True
    if config.resolution % row:
        raise SystemExit(f"grid {config.resolution} not divisible by mesh "
                         f"row={row}")
    return mesh, shard_state(state, mesh), batched


def cmd_info(args) -> int:
    import jax

    config, phillips, state = _build(args)

    def _finite(obj):
        # Strict JSON: json.dumps would emit the non-JSON literals
        # Infinity/NaN for non-finite floats (e.g. the deep-water
        # depth=inf default) — map them to null instead, everywhere.
        if isinstance(obj, float) and not np.isfinite(obj):
            return None
        if isinstance(obj, dict):
            return {k: _finite(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return [_finite(v) for v in obj]
        return obj

    print(json.dumps({
        "devices": [str(d) for d in jax.devices()],
        "config": _finite(dataclasses.asdict(config)),
        "phillips": _finite(dataclasses.asdict(phillips)),
        "state": {"h0": list(state.h0.shape), "omega": list(state.omega.shape)},
    }, indent=2))
    return 0


def cmd_query(args) -> int:
    """Buoy sampling: height/normal of the displaced surface at world
    (x, z) — the readback the reference cannot do (its surface exists
    only as ``ocean.vert``-displaced pixels)."""
    import jax.numpy as jnp

    from gfx_ocean_tpu import make_step
    from gfx_ocean_tpu.checkpoint import load_checkpoint
    from gfx_ocean_tpu.query import sample_surface

    if args.resume:
        state, t0, config = load_checkpoint(args.resume)
        t = args.t if args.t is not None else t0
    else:
        config, _, state = _build(args)
        t = args.t if args.t is not None else 0.0
    pts = []
    for spec in args.points:
        parts = spec.split(",")
        if len(parts) != 2:
            raise SystemExit(f"point wants X,Z (e.g. 40.5,12), got {spec!r}")
        try:
            pts.append((float(parts[0]), float(parts[1])))
        except ValueError:
            raise SystemExit(f"point wants floats, got {spec!r}") from None
    fields = make_step(config)(state, jnp.float32(t))
    cascades = fields.displacement.ndim == 4
    tiles = (tuple(config.domains[0] / d for d in config.domains)
             if cascades else None)
    xq = jnp.asarray([p[0] for p in pts], jnp.float32)
    zq = jnp.asarray([p[1] for p in pts], jnp.float32)
    out = sample_surface(fields.displacement, xq, zq,
                         mesh_resolution=config.mesh_resolution,
                         height_div=config.height_div,
                         horiz_div=config.horiz_div,
                         iterations=args.iterations, tiles=tiles)
    height = np.asarray(out.height)
    normal = np.asarray(out.normal)
    residual = np.asarray(out.residual)
    print(json.dumps({
        "t": float(t),
        "samples": [
            {"x": pts[i][0], "z": pts[i][1],
             "height": float(height[i]),
             "normal": [float(v) for v in normal[i]],
             "residual": float(residual[i]),
             "converged": bool(residual[i] < args.tolerance)}
            for i in range(len(pts))],
    }, indent=2))
    return 0


def cmd_simulate(args) -> int:
    import jax.numpy as jnp

    if args.steps < 1:
        raise SystemExit("--steps must be >= 1")

    from gfx_ocean_tpu import make_rollout, make_step
    from gfx_ocean_tpu.checkpoint import load_checkpoint, save_checkpoint, save_fields

    if args.resume:
        state, t0, config = load_checkpoint(args.resume)
        print(f"resumed from {args.resume} at t={t0}", file=sys.stderr)
    else:
        config, _, state = _build(args)
        t0 = args.t0

    mesh_arg = _parse_mesh_arg(args)
    if mesh_arg is not None:
        from gfx_ocean_tpu.parallel.sharding import (
            make_sharded_rollout, make_sharded_step)

        mesh, state, batched = _mesh_setup(args, config, state)

    ts = t0 + np.arange(args.steps, dtype=np.float32) * args.dt
    if args.save_fields:
        os.makedirs(args.save_fields, exist_ok=True)
        if mesh_arg is not None:
            # Sharded path: per-frame steps (fields gather to host anyway).
            step = make_sharded_step(config, mesh, batched=batched,
                                     fft=args.sharded_fft)
            for i, t in enumerate(ts):
                out = step(state, jnp.float32(t))
                save_fields(os.path.join(args.save_fields, f"frame_{i:05d}.npz"),
                            out.displacement, out.normals, out.foam, t=float(t))
        else:
            # Batched: a keep_fields rollout chunked to an HBM budget —
            # one dispatch + one transfer per chunk instead of a tunnel
            # round trip per frame (frames are independent, SURVEY §2.5).
            per_frame = config.resolution ** 2 * 4 * (
                3 + (3 if config.compute_normals else 0)
                + (1 if config.compute_foam else 0)) * max(1, config.num_cascades)
            chunk = max(1, min(len(ts), (256 << 20) // per_frame))
            rollout = make_rollout(config, keep_fields=True)
            for start in range(0, len(ts), chunk):
                ck = ts[start:start + chunk]
                out = rollout(state, jnp.asarray(ck))
                disp = np.asarray(out.displacement)
                norm = None if out.normals is None else np.asarray(out.normals)
                foam = None if out.foam is None else np.asarray(out.foam)
                for j, t in enumerate(ck):
                    save_fields(
                        os.path.join(args.save_fields,
                                     f"frame_{start + j:05d}.npz"),
                        disp[j], None if norm is None else norm[j],
                        None if foam is None else foam[j], t=float(t))
        print(f"saved {len(ts)} frames to {args.save_fields}")
    else:
        if mesh_arg is not None:
            rollout = make_sharded_rollout(config, mesh, batched=batched,
                                           fft=args.sharded_fft)
        else:
            rollout = make_rollout(config, keep_fields=False)
        sums = np.asarray(rollout(state, jnp.asarray(ts)))
        print(json.dumps({"frames": len(ts), "t0": float(t0),
                          "t1": float(ts[-1]), "checksums_head": sums[:5].tolist()}))
    if args.checkpoint:
        written = save_checkpoint(args.checkpoint, state, float(ts[-1]) + args.dt, config)
        print(f"checkpoint -> {written}", file=sys.stderr)
    return 0


def cmd_bench(args) -> int:
    import jax.numpy as jnp

    from gfx_ocean_tpu import make_rollout
    from gfx_ocean_tpu.utils.profiling import time_rollout, trace

    config, _, state = _build(args)
    mesh_arg = _parse_mesh_arg(args)
    if mesh_arg is not None:
        from gfx_ocean_tpu.parallel.sharding import make_sharded_rollout

        mesh, state, batched = _mesh_setup(args, config, state)
        rollout = make_sharded_rollout(config, mesh, batched=batched,
                                       time_batch=args.time_batch,
                                       fft=args.sharded_fft)
    else:
        rollout = make_rollout(config, keep_fields=False,
                               time_batch=args.time_batch)
    ts = jnp.arange(args.steps, dtype=jnp.float32) * args.dt
    if args.trace_dir:
        with trace(args.trace_dir):
            stats = time_rollout(rollout, state, ts, repeats=1)
    else:
        stats = time_rollout(rollout, state, ts, repeats=args.repeats)
    from gfx_ocean_tpu.ops.fft import effective_precision

    stats.update(resolution=config.resolution, fft_impl=config.fft_impl,
                 precision=config.matmul_precision,
                 effective_precision=effective_precision(
                     config.matmul_precision, config.resolution,
                     config.direct_dft_max, config.fft_impl),
                 time_batch=args.time_batch)
    if mesh_arg is not None:
        stats.update(mesh={"batch": mesh_arg[0], "row": mesh_arg[1]},
                     sharded_fft=args.sharded_fft)
    print(json.dumps(stats))
    return 0


def cmd_synth(args) -> int:
    from gfx_ocean_tpu.assets.bincode import save_omega, save_spectrum
    from gfx_ocean_tpu.utils.complexpair import from_pair_np

    config, phillips, state = _build(args)
    if state.h0.ndim != 3:
        raise SystemExit("synth writes one cascade; use --cascades 1")
    h0 = from_pair_np(np.asarray(state.h0))
    save_spectrum(args.out_spectrum, h0)
    save_omega(args.out_omega, np.asarray(state.omega))
    print(f"wrote {args.out_spectrum} and {args.out_omega} "
          f"({config.resolution}^2, bincode)")
    return 0


def cmd_serve(args) -> int:
    from gfx_ocean_tpu.serve import serve

    config, _, state = _build(args)
    if state.h0.ndim != 3 and _parse_mesh_arg(args) is not None:
        raise SystemExit("serve with a device mesh uses a single cascade")
    mesh = None
    if _parse_mesh_arg(args) is not None:
        if _parse_mesh_arg(args)[0] != 1:
            raise SystemExit("serve renders one field; use --mesh 1,R")
        mesh, state, _ = _mesh_setup(args, config, state)
    server = serve(state, config, host=args.host, port=args.port, mesh=mesh,
                   sharded_fft=args.sharded_fft)
    print(f"serving ocean frames on http://{args.host}:{args.port} "
          f"(/health /config /frame?t= /frame.png?t= /metrics)", file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


def cmd_render(args) -> int:
    import jax.numpy as jnp

    from gfx_ocean_tpu.render.camera import Camera, perspective, scripted_camera
    from gfx_ocean_tpu.render.raster import make_batch_renderer

    config, _, state = _build(args)
    os.makedirs(args.out, exist_ok=True)
    if args.frames <= 0:
        print(f"rendered 0 frames to {args.out}")
        return 0
    # Precompute the whole camera path host-side (deterministic replay of
    # the key script), then run the FUSED step->rasterize->sRGB pipeline
    # in frame chunks: one dispatch + one uint8 transfer per chunk instead
    # of a ~60 ms tunnel round trip per frame.
    script = [(args.frames, args.keys.split(",") if args.keys else [])]
    proj = perspective(args.width / args.height)
    vps, cps = [], []
    for i, cam in scripted_camera(script, dt=args.dt, camera=Camera()):
        vps.append((proj @ cam.view()).astype(np.float32))
        cps.append(cam.position.astype(np.float32))
    vps = np.stack(vps)
    cps = np.stack(cps)
    ts = (args.t0 + np.arange(args.frames) * args.dt).astype(np.float32)
    mesh_arg = _parse_mesh_arg(args)
    chunk = max(1, min(args.frames, 16))
    if mesh_arg is not None:
        # Frames data-parallel over "batch" x viewport bands over "row"
        # (parallel/render.py; bit-equal to the single-chip renderer).
        import jax

        from gfx_ocean_tpu.parallel.render import make_sharded_batch_renderer
        from gfx_ocean_tpu.parallel.sharding import make_mesh

        batch, row = mesh_arg
        if batch * row > len(jax.devices()):
            raise SystemExit(f"--mesh {batch},{row} wants {batch * row} "
                             f"devices; only {len(jax.devices())} visible")
        if args.height % row:
            raise SystemExit(f"--mesh row={row} must divide --height "
                             f"{args.height} (viewport bands)")
        mesh = make_mesh(jax.devices()[: batch * row], batch=batch, row=row)
        renderer = make_sharded_batch_renderer(config, mesh,
                                               width=args.width,
                                               height=args.height)
        chunk = -(-chunk // batch) * batch   # tail pads to a full chunk
    else:
        renderer = make_batch_renderer(config, width=args.width,
                                       height=args.height)
    pil_image = None
    try:
        from PIL import Image as pil_image  # noqa: PLC0415, N813
    except ImportError:
        pass
    if getattr(args, "gif", None) and pil_image is None:
        raise SystemExit("--gif needs Pillow (PIL) installed")
    for start in range(0, args.frames, chunk):
        end = min(start + chunk, args.frames)
        pad = chunk - (end - start)
        sl = slice(start, end)
        # Pad the ragged tail by repeating the last frame (one compiled
        # chunk shape), sliced off after the transfer.
        tsc = np.concatenate([ts[sl], np.repeat(ts[end - 1], pad)])
        vpc = np.concatenate([vps[sl], np.repeat(vps[end - 1:end], pad, 0)])
        cpc = np.concatenate([cps[sl], np.repeat(cps[end - 1:end], pad, 0)])
        srgb = np.asarray(renderer(state, jnp.asarray(tsc), jnp.asarray(vpc),
                                   jnp.asarray(cpc)))[:end - start]
        for j in range(end - start):
            path = os.path.join(args.out, f"frame_{start + j:05d}")
            np.save(path + ".npy", srgb[j])
            if pil_image is not None:
                pil_image.fromarray(srgb[j]).save(path + ".png")
    if getattr(args, "gif", None):
        # Assemble from the PNGs just written through a generator: one
        # RGB frame decoded at a time; Pillow's GIF writer still holds
        # every PALETTIZED frame until the final write, so peak memory
        # is ~1 byte/px/frame instead of the 3 bytes/px/frame an RGB
        # list would hold — bounded, not O(1). GIF timestamps are whole
        # milliseconds; 10 ms floor keeps viewers honest on sub-ms dt.
        paths = [os.path.join(args.out, f"frame_{i:05d}.png")
                 for i in range(args.frames)]
        with pil_image.open(paths[0]) as first:
            first.save(args.gif, save_all=True,
                       append_images=(pil_image.open(p) for p in paths[1:]),
                       duration=max(10, round(args.dt * 1000)), loop=0)
        print(f"wrote {args.gif} ({args.frames} frames)")
    print(f"rendered {args.frames} frames to {args.out} "
          f"(sRGB uint8, chunked x{chunk})")
    return 0


def _honor_platform_env() -> None:
    """Make ``JAX_PLATFORMS=cpu python -m gfx_ocean_tpu ...`` mean it.

    The container's sitecustomize may import jax first and re-pin the
    tunneled TPU platform; the user's env var is the intent (same trap as
    ``__graft_entry__.dryrun_multichip`` — see .claude/skills/verify).
    """
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        jax.config.update("jax_platforms", want)


def main(argv=None) -> int:
    _honor_platform_env()
    from gfx_ocean_tpu.utils.compile_cache import enable_default_cache
    enable_default_cache()
    parser = argparse.ArgumentParser(
        prog="gfx_ocean_tpu",
        description="TPU-native FFT ocean simulation (gfx-rs/gfx-ocean rebuilt for TPU)")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("info", help="show config / devices / asset stats")
    _add_common(p)
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("simulate", help="run a rollout")
    _add_common(p)
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--dt", type=float, default=1 / 60)
    p.add_argument("--t0", type=float, default=0.0)
    p.add_argument("--save-fields", type=str, default=None,
                   help="directory for per-frame field .npz dumps")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--resume", type=str, default=None)
    p.set_defaults(fn=cmd_simulate)

    p = sub.add_parser("bench", help="measure steps/sec")
    _add_common(p)
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--dt", type=float, default=1 / 60)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--time-batch", type=int, default=4)
    p.add_argument("--trace-dir", type=str, default=None,
                   help="write a jax.profiler trace here")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("synth", help="generate spectrum.bin / omega.bin")
    _add_common(p)
    p.add_argument("--out-spectrum", type=str, default="spectrum.bin")
    p.add_argument("--out-omega", type=str, default="omega.bin")
    p.set_defaults(fn=cmd_synth, phillips=True)

    p = sub.add_parser("serve", help="HTTP frame server (frames by absolute t)")
    _add_common(p)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8807)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("render", help="rasterize frames along a scripted camera")
    _add_common(p)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--dt", type=float, default=1 / 60)
    p.add_argument("--t0", type=float, default=0.0)
    p.add_argument("--width", type=int, default=600)
    p.add_argument("--height", type=int, default=350)
    p.add_argument("--samples", type=int, default=32,
                   help="(compat) window-impl sample budget; the fused "
                        "pool path used by this command ignores it")
    p.add_argument("--keys", type=str, default="",
                   help="comma-separated held keys (w,s,left,right,up,down)")
    p.add_argument("--out", type=str, default="frames")
    p.add_argument("--gif", type=str, default=None, metavar="PATH",
                   help="also write the frames as one animated GIF at "
                        "the camera script's frame rate (the shippable "
                        "analog of the reference README's demo video)")
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser("query", help="water height/normal at world points "
                                     "(buoy sampling)")
    _add_common(p)
    p.add_argument("points", nargs="+", metavar="X,Z",
                   help="world-space query points (mesh grid step = 1 "
                        "unit; one patch spans mesh_resolution - 1)")
    p.add_argument("-t", type=float, default=None,
                   help="absolute sim time (default 0, or the "
                        "checkpoint's t with --resume)")
    p.add_argument("--resume", type=str, default=None,
                   help="load state/config from a checkpoint .npz")
    p.add_argument("--iterations", type=int, default=8,
                   help="choppy-inversion fixed-point steps")
    p.add_argument("--tolerance", type=float, default=1e-3,
                   help="residual below which a sample reports converged")
    p.set_defaults(fn=cmd_query)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
