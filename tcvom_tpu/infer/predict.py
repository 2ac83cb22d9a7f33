"""Inference pipelines.

TPU-native re-design of the reference's three inference drivers:
- ``predict_vmd``    (pred_vmn.py): VideoMatting108 val sweep through the
  *training* wrapper — trimaps re-synthesized from gt alpha at a fixed
  dilation, 3-frame sliding window at 1088x1920, per-frame pred/tri PNGs +
  loss.log for calc_metric.
- ``predict_single`` (pred_single.py): same but single-frame wrapper.
- ``predict_test``   (pred_test.py): wild folders with real trimaps
  through the EvalModel path, padded to /32 and cropped back.

One jitted step serves the whole sweep (static shapes); batches shard over
the data mesh instead of nn.DataParallel scatter/gather.
"""
from __future__ import annotations

import os
from typing import Callable

import numpy as np

try:
    import cv2
    cv2.setNumThreads(0)
except ImportError:     # pragma: no cover
    cv2 = None

import jax
import jax.numpy as jnp

from tcvom_tpu.models import full_model as FM
from tcvom_tpu.ops import subpixel

TRIMAP_DILATION = {"narrow": 5, "medium": 12, "wide": 20}  # pred_vmn.py:70-75


def make_vmd_eval_step(module, cfg: FM.TaskConfig):
    """Jitted forward through FullModel_VMD returning per-batch loss sums,
    center-frame alphas and the trimap visualization."""

    @jax.jit
    def step(variables, batch, key):
        losses, aux, _ = FM.forward_vmd(module, variables, key, batch, cfg,
                                        train=False)
        pre = aux["pre"]
        c = batch["a"].shape[1] // 2
        tris_vis = jnp.where(pre["trimasks"] > 0.5, 128.0 / 255.0,
                             pre["scaled_gts"])
        return losses, aux["alphas"][:, c], tris_vis[:, c]

    return step


def make_single_eval_step(module, cfg: FM.TaskConfig):
    @jax.jit
    def step(variables, batch, key):
        losses, aux, _ = FM.forward_single(module, variables, key, batch, cfg,
                                           train=False)
        pre = aux["pre"]
        c = batch["a"].shape[1] // 2
        if cfg.trimap_channels != 1:
            tris_vis = jnp.where(pre["trimasks"] > 0.5, 128.0 / 255.0,
                                 pre["scaled_gts"])
        else:
            tris_vis = pre["tris"]
        return losses, aux["alphas"][:, c], tris_vis[:, c]

    return step


def write_pred_pngs(save_dir: str, names: list[str], alphas: np.ndarray,
                    tris: np.ndarray, crop_hw=(1080, 1920)):
    """Write <name>_pred.png / <name>_tri.png cropped to the original
    resolution (pred_vmn.py:125-135). ``crop_hw`` is one (h, w) for the
    whole batch or a list of per-sample (h, w) (Adobe eval images differ
    in size — reference pred_single.py:159-166 crops per sample)."""
    per_sample = crop_hw and not np.isscalar(crop_hw[0])
    for i, name in enumerate(names):
        h, w = crop_hw[i] if per_sample else crop_hw
        fn = os.path.splitext(name)[0]
        os.makedirs(os.path.join(save_dir, os.path.dirname(fn)), exist_ok=True)
        a = np.uint8(np.clip(alphas[i, :h, :w, 0], 0, 1) * 255)
        t = np.uint8(np.clip(tris[i, :h, :w, 0], 0, 1) * 255)
        cv2.imwrite(os.path.join(save_dir, fn + "_pred.png"), a)
        cv2.imwrite(os.path.join(save_dir, fn + "_tri.png"), t)


# ---------------------------------------------------------------------------
# Streaming sliding-window pipeline (the production inference path)
# ---------------------------------------------------------------------------

class StreamingPredictor:
    """Sliding 3-frame VMN inference with cached per-frame features.

    The reference (pred_vmn.py / pred_test.py) re-encodes every frame of
    each window — 3 encoder passes per output matte. Here each frame is
    encoded exactly once (``encode`` caches the backbone + extract-half
    outputs); each new matte costs one encode + one FAM-and-decode step:
    ~3x fewer FLOPs at identical numerics.

    Usage::

        sp = StreamingPredictor(module, variables, cfg)
        state = None
        for img, tri in frames:          # [B, H, W, {3,1}] uint8-range
            state, out = sp.step(state, img, tri)
            if out is not None: ...      # matte for the previous frame
    """

    def __init__(self, module, variables, cfg: FM.TaskConfig, dtype=None,
                 fgbg: bool = True, quantize: bool = False):
        """``dtype=jnp.bfloat16`` runs the network in bf16 (params cast
        once, activations bf16, preprocessing and output pasting stay f32)
        — ~half the HBM traffic. Default f32 preserves reference numerics.

        ``quantize=True`` (matte path only, requires ``fgbg=False`` for
        FBA) fuses the trimap paste and the PNG quantization into the
        decode jit and returns ``uint8 [B, H, W]`` mattes. The paste runs
        on channel-squeezed [B, H, W] tensors: a [B, H, W, 1] f32 select
        materializes in a lane-padded layout (minor dim 1 -> 128 lanes,
        measured 8.3 ms at 5 GB/s logical, PROFILE_r04_attrib top op) while
        the squeezed form tiles (8, 128) over (H, W) at HBM rate. It also
        removes the separate ``to_u8`` dispatch per frame (a tunnel RTT)
        and shrinks the decode jit boundary from 8 MB f32 to 2 MB u8.
        Byte-exact with ``np.uint8(np.clip(alpha, 0, 1) * 255)`` of the
        f32 path (jnp.floor matches numpy's truncation).

        ``fgbg=False`` (FBA only) returns just the alpha matte instead of
        (alpha, F, B): the F/B pastes, clips, and — with the packed-space
        fusion solve — their 48-channel subpixel unpacks become dead code
        inside the decode jit. The wild-folder path (pred_test) writes
        only alpha PNGs, matching the reference's outputs
        (pred_test.py:86-116).

        The encode->decode boundary carries only what decode reads: the
        enc pytree is pruned to the head's inputs (``prune_enc_head`` —
        e.g. FBA's extract-only OS=8 pyramid, ~115 MB/frame at 1080p,
        never enters the cache) and the prev/next slots enter decode as
        bare ``feat`` arrays. An AUTO-layout AOT negotiation across this
        boundary was prototyped and measured flat (15.74 -> 15.76 fps at
        1080p bf16): with the pruned boundary XLA's chosen layouts for
        the crossing tensors already match the defaults, so there are no
        boundary relayouts left to kill.
        """
        assert cfg.is_vmn, "streaming pipeline drives VMN models"
        assert not (quantize and fgbg and cfg.method == "fba"), \
            "quantize=True returns the alpha matte only (set fgbg=False)"
        self.module = module
        self.dtype = dtype
        self.fgbg = fgbg
        self.quantize = quantize
        # FBA's packed fusion solve can hand back alpha still in the s4d
        # 16-pack layout — quantization happens packed and the full-res
        # [..., 1] f32 unpack/squeeze relayouts (measured 1.6 ms/frame at
        # 1080p, PROFILE_r05 copy.1175 + squeeze.6) never materialize
        self._packed_alpha = bool(quantize and cfg.method == "fba"
                                  and not fgbg)
        self.variables = (jax.tree.map(
            lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating)
            else a, variables) if dtype is not None else variables)
        self.cfg = cfg
        self._encode = jax.jit(self._encode_impl)
        self._decode = jax.jit(self._decode_impl)

    def _run_encode(self, img, tri):
        return self._encode(self.variables, img, tri)

    def _run_decode(self, prev, cur, nxt):
        # the center's own key projection is not a decode input — strip it
        # so the jit boundary carries no unused leaf
        cur_c = {kk: cur[kk] for kk in cur if kk != "k"}
        return self._decode(self.variables, cur_c, prev["k"], nxt["k"])

    def _encode_impl(self, variables, img, tri):
        cfg = self.cfg
        # accept uint8 frames (the wild-folder path ships uint8 to the
        # device and casts here, on the device) as well as f32
        tri_raw = tri
        img = img.astype(jnp.float32)
        tri = tri.astype(jnp.float32)
        pre = FM.preprocess_eval(img[:, None], tri[:, None], cfg)
        inputs = jnp.concatenate([pre["imgs"], pre["tris"]], axis=-1)[:, 0]
        extras = None
        if cfg.method == "fba":
            extras = (pre["scaled_imgs"][:, 0], pre["tris"][:, 0, ..., -2:])
        if self.dtype is not None:
            inputs = inputs.astype(self.dtype)
            extras = jax.tree.map(lambda a: a.astype(self.dtype), extras)
        enc, qkv = self.module.apply(
            variables, inputs, extras=extras, train=False,
            method=type(self.module).encode_extract_qkv)
        # cache only what the head half reads — the extract-only leaves
        # (e.g. FBA's OS=8 pyramid, ~115 MB/frame) would both bloat the
        # cache and, as unused decode parameters, veto layout negotiation.
        # FAM projections are cached per frame (q, k, v) so decode runs no
        # convolutions before the attention and a frame's key is computed
        # once, not once per window it neighbors.
        prune = getattr(type(self.module.decoder), "prune_enc_head", None)
        if prune is not None:
            enc = prune(enc)
        out = dict(enc=enc, q=qkv["q"], k=qkv["k"], v=qkv["v"],
                   trimask=pre["trimasks"][:, 0])
        if self.quantize:
            # channel-squeezed paste aids: the [B, H, W, 1] full-res form
            # tiles 1 of 128 lanes, so the paste gate and the quantized
            # known-region trimap cross the boundary as W-minor [B, H, W]
            # bool/uint8 (quantize-before-select commutes with the select,
            # so this stays byte-exact with the f32 paste-then-quantize).
            # Both derive from ONE squeeze of the raw upload (u8 in the
            # wild path — 2 MB) instead of two degenerate-lane f32
            # relayouts of preprocess outputs (~0.8 ms each at 1080p).
            s = tri_raw[:, :, :, 0].astype(jnp.float32) * FM.IMG_SCALE
            out["gt_u8"] = jnp.floor(
                jnp.clip(s, 0.0, 1.0) * 255.0).astype(jnp.uint8)
            if cfg.dilate_radius is None:
                # trimask is pointwise in tri here: unknown iff 0<tri/255<1
                out["paste_gate"] = (s > 0.0) & (s < 1.0)
            else:
                out["paste_gate"] = pre["trimasks"][:, 0, :, :, 0] > 0.5
        else:
            out["gt_tri"] = tri * FM.IMG_SCALE
            out["scaled_img"] = pre["scaled_imgs"][:, 0]
        return out

    def _decode_impl(self, variables, cur, prev_k, nxt_k):
        cfg = self.cfg
        pred, attb, attf, _ = self.module.apply(
            variables, cur["enc"], {"q": cur["q"], "v": cur["v"]},
            prev_k, nxt_k, cur["trimask"], train=False, need_logits=False,
            packed_alpha=self._packed_alpha,
            method=type(self.module).decode_window_qkv)
        if self.quantize:
            # quantize-then-paste in uint8 (see __init__): byte-exact with
            # paste-then-quantize since floor/clip commute with the select
            if self._packed_alpha:
                # pred is s4d-packed alpha [B, H/4, W/4, 16] — quantize on
                # the packed grid, unpack as a single W-minor u8 transpose
                a8 = jnp.floor(jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)
                               * 255.0).astype(jnp.uint8)
                a8 = subpixel.d4s_flat(a8)
            else:
                a8 = jnp.floor(
                    jnp.clip(pred[..., 0].astype(jnp.float32), 0.0, 1.0)
                    * 255.0).astype(jnp.uint8)
            return jnp.where(cur["paste_gate"], a8, cur["gt_u8"])
        mask = cur["trimask"] > 0.5
        alpha = jnp.where(mask, pred[..., 0:1], cur["gt_tri"])
        if cfg.method == "fba" and self.fgbg:
            f = jnp.where(mask, pred[..., 1:4], cur["scaled_img"])
            b = jnp.where(mask, pred[..., 4:7], cur["scaled_img"])
            return alpha, f, b
        return alpha

    def step(self, state, img, tri):
        """Feed one frame; returns (state, matte-or-None).

        Clip edges reflect like the reference's sample parser
        (dataset/VMD.py:168-184): frame 0's window is [f1, f0, f1], and
        :meth:`flush` emits the last frame's matte with [fN-2, fN-1, fN-2].
        The matte returned by the i-th call (i >= 1) is for frame i-1.
        """
        # NB: encode and decode stay two jit calls — a fused single-call
        # variant measured 12.9 vs 15.4 fps (XLA schedules the combined
        # graph with higher peak memory and worse overlap), and the
        # pruned boundary crosses with default layouts on both sides
        # (AUTO-layout negotiation measured flat, see __init__).
        frame = self._run_encode(jnp.asarray(img), jnp.asarray(tri))
        if state is None:
            return ("first", frame), None
        if state[0] == "first":
            f0 = state[1]
            out0 = self._run_decode(frame, f0, frame)
            return ({"k": f0["k"]}, frame), out0
        prev, cur = state
        out = self._run_decode(prev, cur, frame)
        # a frame that has served as the window center is only ever read
        # as a neighbor (its key projection) afterwards — drop the rest
        return ({"k": cur["k"]}, frame), out

    def flush(self, state):
        """Emit the final frame's matte (reflected next neighbor)."""
        if state[0] == "first":       # single-frame clip
            f = state[1]
            return self._run_decode(f, f, f)
        prev, cur = state
        return self._run_decode(prev, cur, prev)


# ---------------------------------------------------------------------------
# Wild-video test folders (pred_test.py)
# ---------------------------------------------------------------------------

class TestFolder:
    """(prev, cur, next) frame triplets from NNNNN_rgb.png / NNNNN_trimap.png
    folders, edge-mirrored, padded to multiples of 32
    (reference pred_test.py:17-84)."""

    def __init__(self, root: str):
        self.root = root
        names = sorted(f[:-8] for f in os.listdir(root) if f.endswith("_rgb.png"))
        assert names, f"no *_rgb.png in {root}"
        self.names = names

    def __len__(self):
        return len(self.names)

    def _read(self, i):
        name = self.names[i]
        img = cv2.imread(os.path.join(self.root, name + "_rgb.png"), cv2.IMREAD_COLOR)
        tri = cv2.imread(os.path.join(self.root, name + "_trimap.png"),
                         cv2.IMREAD_GRAYSCALE)
        return np.float32(img), np.float32(tri)[..., None]

    def read_frame(self, i):
        """One padded frame pair (the streaming path decodes each PNG once;
        the triplet ``__getitem__`` is for the single-frame batch path).

        Stays uint8 end to end: the f32 cast happens on device inside the
        encode step, so the host skips two 25 MB float conversions+pads and
        the host->device transfer ships 8 MB instead of 33 MB — on a
        1-core host feeding through a tunnel both are on the critical
        path."""
        name = self.names[i]
        img = cv2.imread(os.path.join(self.root, name + "_rgb.png"),
                         cv2.IMREAD_COLOR)
        tri = cv2.imread(os.path.join(self.root, name + "_trimap.png"),
                         cv2.IMREAD_GRAYSCALE)[..., None]
        h, w = img.shape[:2]
        ph, pw = (-h) % 32, (-w) % 32
        pad = lambda t: np.pad(t, ((0, ph), (0, pw), (0, 0)))
        return pad(img)[None], pad(tri)[None], (h, w), name

    def __getitem__(self, i):
        idxs = [max(i - 1, 0), i, min(i + 1, len(self.names) - 1)]
        imgs, tris = zip(*[self._read(j) for j in idxs])
        h, w = imgs[0].shape[:2]
        ph = (-h) % 32
        pw = (-w) % 32
        pad = lambda t: np.pad(t, ((0, ph), (0, pw), (0, 0)))
        return {
            "imgs": np.stack([pad(x) for x in imgs]),
            "tris": np.stack([pad(x) for x in tris]),
            "orig_hw": np.asarray((h, w), np.int32),
            "name": self.names[i],
        }


def predict_test_folder(module, variables, cfg: FM.TaskConfig, in_dir: str,
                        out_dir: str, progress: Callable | None = None,
                        dtype=None):
    """EvalModel inference over a wild folder; writes <name>_alpha.png
    (reference pred_test.py:86-116). VMN models run the streaming pipeline
    (one encode per frame); single-frame models run per-frame.
    ``dtype=jnp.bfloat16`` selects the guarded bf16 compute path.

    Returns a per-phase wall-time breakdown (seconds summed over the run)
    so the e2e number is attributable: where the MAIN loop blocked
    (``main_qget`` waiting on the decoder thread, ``main_step`` in the
    encode/decode dispatches, ``main_tou8`` in the quantize dispatch,
    ``main_wqput`` waiting on the writer), and what each side thread spent
    (``prod_read`` PNG decode+pad, ``writer_fetch`` device->host matte
    readback, ``writer_imwrite`` PNG encode)."""
    import time as _time
    folder = TestFolder(in_dir)
    os.makedirs(out_dir, exist_ok=True)
    stats: dict = {"frames": len(folder)}

    def _acc(key, t0):
        stats[key] = stats.get(key, 0.0) + (_time.perf_counter() - t0)

    def write(name, alpha, hw):
        h, w = hw
        cv2.imwrite(os.path.join(out_dir, name + "_alpha.png"),
                    np.uint8(np.clip(np.asarray(alpha)[0, :h, :w, 0], 0, 1) * 255))

    if cfg.is_vmn:
        # host pipeline: a bounded prefetch thread decodes frame i+k while
        # the device mattes frame i (each PNG decoded exactly once), and a
        # writer thread fetches mattes + runs the (even costlier) PNG
        # encodes off the loop — the main loop never blocks on the device,
        # so dispatches pipeline through the tunnel. The reference leaned
        # on 8-16 DataLoader workers for the same overlap
        # (SYSTEM.NUM_WORKERS); this host has few cores, so one decoder +
        # one writer thread with depth-4 queues is the right size.
        import queue as _queue
        import threading
        q: "_queue.Queue" = _queue.Queue(maxsize=4)
        wq: "_queue.Queue" = _queue.Queue(maxsize=4)

        # quantization happens INSIDE the decode jit (StreamingPredictor
        # quantize=True): the matte arrives as uint8 [B, H, W] — 2 MB per
        # frame over the link, no separate to_u8 dispatch, and the paste
        # runs channel-squeezed (the [.., 1]-channel f32 select measured
        # 8.3 ms in a lane-padded layout, PROFILE_r04_attrib top op).

        def consume():
            while True:
                item = wq.get()
                if item is None:
                    return
                name, alpha_u8, hw = item
                h, w = hw
                t0 = _time.perf_counter()
                a = np.asarray(alpha_u8)
                _acc("writer_fetch", t0)
                t0 = _time.perf_counter()
                cv2.imwrite(os.path.join(out_dir, name + "_alpha.png"),
                            a[0, :h, :w])
                _acc("writer_imwrite", t0)

        writer = threading.Thread(target=consume, daemon=True)
        writer.start()

        def produce():
            for i in range(len(folder)):
                t0 = _time.perf_counter()
                img, tri, hw, name = folder.read_frame(i)
                _acc("prod_read", t0)
                # upload from the producer thread so the host->device
                # transfer (8+2.7 MB/frame; expensive through a device
                # tunnel) overlaps with the main loop's dispatches instead
                # of serializing in front of them
                t0 = _time.perf_counter()
                img, tri = jax.device_put(img), jax.device_put(tri)
                _acc("prod_upload", t0)
                q.put((img, tri, hw, name))
            q.put(None)

        threading.Thread(target=produce, daemon=True).start()
        sp = StreamingPredictor(module, variables, cfg, dtype=dtype,
                                fgbg=False, quantize=True)
        state = None
        pending = []        # (name, orig_hw) awaiting their matte
        i = 0
        while True:
            t0 = _time.perf_counter()
            item = q.get()
            _acc("main_qget", t0)
            if item is None:
                break
            img, tri, hw, name = item
            t0 = _time.perf_counter()
            state, out = sp.step(state, img, tri)
            _acc("main_step", t0)
            pending.append((name, hw))
            if out is not None:
                name, hw = pending.pop(0)
                t0 = _time.perf_counter()
                wq.put((name, out, hw))
                _acc("main_wqput", t0)
                if progress:
                    progress(i, len(folder))
            i += 1
        if state is not None and pending:
            out = sp.flush(state)
            name, hw = pending.pop(0)
            wq.put((name, out, hw))
        wq.put(None)
        writer.join()
        return stats

    step = jax.jit(lambda v, imgs, tris: FM.forward_eval(module, v, imgs, tris, cfg))
    for i in range(len(folder)):
        item = folder[i]
        t0 = _time.perf_counter()
        out = step(variables, jnp.asarray(item["imgs"])[None],
                   jnp.asarray(item["tris"])[None])
        alphas = out[0] if isinstance(out, tuple) else out
        c = item["imgs"].shape[0] // 2
        _acc("main_step", t0)
        t0 = _time.perf_counter()
        write(item["name"], alphas[:, c], tuple(item["orig_hw"]))
        _acc("writer_imwrite", t0)
        if progress:
            progress(i, len(folder))
    return stats
