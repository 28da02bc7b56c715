"""Video mode: two-pass depth video generation with temporal consistency.

Parity with reference src/video_mode.py:
 * open_path_as_images (:13-68): GIF/webp via PIL, container formats via
   imageio/ffmpeg when present, plus (new) directories of frames;
 * two-pass flow (:131-175): pass 1 collects raw (un-normalized) per-frame
   predictions, global scaling + optional 'experimental' 5-tap temporal
   smoothing with 0.5/99.5 percentile clamp (:103-128); pass 2 re-runs the
   funnel with the processed depthmaps injected;
 * frames_to_video (:71-100): 16-bit depth videos, color videos through a
   codec priority list.  Without ffmpeg in the environment, depth videos are
   written as 16-bit PNG sequences and color videos as GIF + PNG sequence
   (documented deviation; mp4/webm/FFV1 require ffmpeg).

TPU difference: pass-1 predictions for same-sized frames run as *batched*
device calls (frames are the data axis) instead of the reference's
frame-at-a-time loop.
"""
from __future__ import annotations

import os
import pathlib
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

from depthmap_tpu.io.image import get_next_sequence_number
from depthmap_tpu.options import GenerationOptions


def read_depth_video_16(path: str):
    """Lossless gray16le depth-video ingest (reference video_mode.py:39-55
    reads 16-bit FFV1 AVIs written by the depth encoder).  Returns
    (fps, [I;16 frames]) or None when the stream is not 16-bit grayscale.
    Handles both the raw Y16 AVIs this package writes (zero-dep path,
    io/avi.py) and FFV1 gray16le AVIs via pyav when present."""
    from depthmap_tpu.io.avi import read_gray16_avi
    raw = read_gray16_avi(path)
    if raw is not None:
        fps, arrs = raw
        return fps, [Image.fromarray(a, mode="I;16") for a in arrs]
    try:
        import av
    except Exception:
        return None
    container = None
    try:
        container = av.open(path)
        stream = container.streams.video[0]
        if "gray16" not in str(stream.codec_context.format.name):
            return None
        fps = float(stream.average_rate or 24)
        frames = []
        for frame in container.decode(video=0):
            arr = frame.to_ndarray(format="gray16le")
            frames.append(Image.fromarray(arr.astype(np.uint16), mode="I;16"))
        return fps, frames
    except Exception:
        return None
    finally:
        if container is not None:
            container.close()


def write_depth_video_16(frames: List[Image.Image], fps: float,
                         out_path: str) -> bool:
    """16-bit depth AVI writer.  Prefers FFV1 gray16le via pyav (the
    reference's encoder, video_mode.py:72-84, losslessly compressed); when
    pyav is absent, writes an uncompressed rawvideo Y16 AVI with the
    zero-dependency container writer (io/avi.py) — same 16-bit fidelity,
    playable by any ffmpeg-based tool.  Returns False only if both fail."""
    try:
        import av
        from fractions import Fraction
    except Exception:
        from depthmap_tpu.io.avi import write_gray16_avi
        try:
            write_gray16_avi(
                [np.asarray(f, dtype=np.uint16) for f in frames], fps,
                out_path)
            return True
        except Exception:
            if os.path.exists(out_path):
                try:
                    os.remove(out_path)
                except OSError:
                    pass
            return False
    container = None
    try:
        w, h = frames[0].size
        container = av.open(out_path, "w", format="avi")
        stream = container.add_stream("ffv1",
                                      rate=Fraction(fps).limit_denominator())
        stream.width, stream.height = w, h
        stream.pix_fmt = "gray16le"
        for f in frames:
            vf = av.VideoFrame.from_ndarray(
                np.asarray(f, dtype=np.uint16), format="gray16le")
            for pkt in stream.encode(vf):
                container.mux(pkt)
        for pkt in stream.encode():
            container.mux(pkt)
        container.close()
        return True
    except Exception:
        # close + remove the partial file so the fallback does not leave a
        # corrupt .avi next to the good output
        if container is not None:
            try:
                container.close()
            except Exception:
                pass
        if os.path.exists(out_path):
            try:
                os.remove(out_path)
            except OSError:
                pass
        # pyav present but FFV1 encoding failed (e.g. its ffmpeg build
        # lacks the encoder): the zero-dep Y16 writer can still produce a
        # valid 16-bit AVI — "False only if both fail"
        from depthmap_tpu.io.avi import write_gray16_avi
        try:
            write_gray16_avi(
                [np.asarray(f, dtype=np.uint16) for f in frames], fps,
                out_path)
            return True
        except Exception:
            if os.path.exists(out_path):
                try:
                    os.remove(out_path)
                except OSError:
                    pass
            return False


def _write_color_video(arrs: List[np.ndarray], fps: float, path: str,
                       name: str, colorvids_bitrate: Optional[int] = None
                       ) -> Optional[str]:
    """Reference codec priority chain (video_mode.py:85-99): png/rawvideo
    AVI -> libx264 mp4 -> libvpx webm; reversed (smallest-first) when a
    bitrate is requested.  Returns the written path or None (no pyav)."""
    try:
        import av
        from fractions import Fraction
    except Exception:
        return None
    priority = [("avi", "png"), ("avi", "rawvideo"), ("mp4", "libx264"),
                ("webm", "libvpx")]
    if colorvids_bitrate:
        priority = list(reversed(priority))
    for v_format, codec in priority:
        out = os.path.join(path, f"{name}.{v_format}")
        container = None
        try:
            container = av.open(out, "w", format=v_format)
            stream = container.add_stream(
                codec, rate=Fraction(fps).limit_denominator())
            stream.width, stream.height = arrs[0].shape[1], arrs[0].shape[0]
            stream.pix_fmt = "rgb24" if codec in ("png", "rawvideo") \
                else "yuv420p"
            if colorvids_bitrate and codec not in ("png", "rawvideo"):
                stream.bit_rate = int(colorvids_bitrate) * 1000
            for a in arrs:
                vf = av.VideoFrame.from_ndarray(a, format="rgb24")
                for pkt in stream.encode(vf):
                    container.mux(pkt)
            for pkt in stream.encode():
                container.mux(pkt)
            container.close()
            return out
        except Exception:
            import traceback
            traceback.print_exc()
            # close + remove the partial file before trying the next codec
            if container is not None:
                try:
                    container.close()
                except Exception:
                    pass
            if os.path.exists(out):
                try:
                    os.remove(out)
                except OSError:
                    pass
    return None


def open_path_as_images(path: str, maybe_depthvideo: bool = False
                        ) -> Tuple[float, List[Image.Image]]:
    """(fps, frames).  Frames are PIL images."""
    p = pathlib.Path(path)
    suffix = p.suffix.lower()
    if suffix == ".avi" and maybe_depthvideo:
        got = read_depth_video_16(path)
        if got is not None:
            return got
    if p.is_dir():
        files = sorted(f for f in p.iterdir()
                       if f.suffix.lower() in (".png", ".jpg", ".jpeg",
                                               ".webp", ".tif", ".tiff"))
        if not files:
            raise Exception(f"No frames found in directory {path}")
        return 24.0, [Image.open(str(f)) for f in files]
    if suffix in (".gif", ".webp"):
        frames = []
        img = Image.open(path)
        for i in range(getattr(img, "n_frames", 1)):
            img.seek(i)
            frames.append(img.convert("RGB"))
        duration = img.info.get("duration", 100) or 100
        return 1000 / duration, frames
    if suffix in (".webm", ".mp4", ".avi", ".mts"):
        try:
            import imageio.v3 as iio
            meta = iio.immeta(path, plugin="pyav")
            fps = float(meta.get("fps", 24))
            frames = [Image.fromarray(f) for f in iio.imiter(path)]
            return fps, frames
        except Exception as e:
            raise Exception(
                f"Decoding {suffix} requires an ffmpeg/pyav backend, which "
                f"is not available here. Extract the video into a directory "
                f"of frames and pass the directory instead.") from e
    try:
        return 1, [Image.open(path)]
    except Exception as e:
        raise Exception(f"Probably an unsupported file format: {suffix}") \
            from e


def frames_to_video(fps: float, frames: List[Image.Image], path: str,
                    name: str, colorvids_bitrate: Optional[int] = None
                    ) -> List[str]:
    """Encode frames; returns list of written paths."""
    os.makedirs(path, exist_ok=True)
    written = []
    if frames[0].mode.startswith("I"):  # 16-bit depth video
        # reference writes gray16le FFV1 AVI (video_mode.py:72-84); without
        # pyav we keep full fidelity with a 16-bit PNG sequence
        avi_path = os.path.join(path, f"{name}.avi")
        if write_depth_video_16(frames, fps, avi_path):
            written.append(avi_path)
            return written
        seq_dir = os.path.join(path, name)
        os.makedirs(seq_dir, exist_ok=True)
        for i, f in enumerate(frames):
            fn = os.path.join(seq_dir, f"{i:06d}.png")
            f.save(fn)
        with open(os.path.join(seq_dir, "fps.txt"), "w") as fh:
            fh.write(str(fps))
        written.append(seq_dir)
        return written

    arrs = [f.convert("RGB") for f in frames]
    vid_path = _write_color_video([np.asarray(a) for a in arrs], fps, path,
                                  name, colorvids_bitrate)
    if vid_path is not None:
        written.append(vid_path)
        return written
    # no ffmpeg/pyav backend: GIF keeps the output viewable everywhere
    gif_path = os.path.join(path, f"{name}.gif")
    arrs[0].save(gif_path, save_all=True, append_images=arrs[1:],
                 duration=max(int(round(1000 / fps)), 1), loop=0)
    written.append(gif_path)
    try:
        import imageio.v3 as iio
        mp4_path = os.path.join(path, f"{name}.mp4")
        iio.imwrite(mp4_path, np.stack([np.asarray(a) for a in arrs]),
                    plugin="pyav", fps=fps)
        written.append(mp4_path)
    except Exception:
        pass  # mp4 needs ffmpeg; GIF already saved
    return written


def process_predictions(predictions: List[np.ndarray],
                        smoothening: str = "none") -> List[np.ndarray]:
    """Global scaling + optional temporal smoothing (reference :103-128)."""
    def global_scaling(objs, a=None, b=None):
        min_value = a if a is not None else min(o.min() for o in objs)
        max_value = b if b is not None else max(o.max() for o in objs)
        return [(o - min_value) / (max_value - min_value) for o in objs]

    if smoothening == "none":
        return global_scaling(predictions)
    if smoothening == "experimental":
        n = len(predictions)
        processed = []
        for i in range(n):
            f = np.zeros_like(predictions[i])
            for u, mul in enumerate([0.10, 0.20, 0.40, 0.20, 0.10]):
                f += mul * predictions[min(max(0, i + u - 2), n - 1)]
            processed.append(f)
        a, b = np.percentile(np.stack(processed), [0.5, 99.5])
        return global_scaling(predictions, a, b)
    return predictions


def _predict_video_depths(input_images, inp, predictor_cache,
                          chunk: int = 8) -> List[np.ndarray]:
    """Pass 1: raw per-frame predictions.  Same-sized frames without Boost
    run as chunked batched device calls (the reference loops frame by frame,
    src/video_mode.py:148); otherwise falls back to the funnel."""
    from depthmap_tpu.pipeline.core import (PredictorCache,
                                            core_generation_funnel)

    sizes = {im.size for im in input_images}
    inp_ = GenerationOptions.from_dict(inp)
    from depthmap_tpu.registry import resolve_model_type
    marigold = resolve_model_type(inp_.model_type) == 10
    if len(sizes) == 1 and not inp_.boost and not marigold:
        cache = predictor_cache or PredictorCache()
        predictor = cache.get(inp_.model_type, tiling_mode=inp_.tiling_mode)
        w, h = input_images[0].size
        if inp_.net_size_match:
            net_w, net_h = (w + 31) // 32 * 32, (h + 31) // 32 * 32
        else:
            net_w, net_h = inp_.net_width, inp_.net_height
        frames = np.stack([np.asarray(im.convert("RGB"), np.float32) / 255.0
                           for im in input_images])
        starts = list(range(0, len(frames), chunk))
        counts = [min(chunk, len(frames) - s) for s in starts]

        def blocks():
            for s, n in zip(starts, counts):
                blk = frames[s:s + n]
                if n < chunk:
                    # pad the ragged tail to the chunk: one compiled batch
                    # shape for any video length (a fresh XLA program per
                    # tail size costs tens of seconds on TPU)
                    blk = np.concatenate(
                        [blk, np.repeat(blk[-1:], chunk - n, axis=0)],
                        axis=0)
                yield blk

        # pipelined: chunk i+1's forward is in flight while chunk i downloads
        preds = [p[:n] for p, n in zip(
            predictor.predict_batch_stream(blocks(), net_w, net_h), counts)]
        preds = np.concatenate(preds, axis=0)
        if predictor.raw_prediction_invert:
            preds = -preds
        return [p for p in preds]

    first_pass = inp_.replace(do_output_depth_prediction=True,
                              do_output_depth=False, gen_stereo=False,
                              gen_normalmap=False, gen_heatmap=False,
                              gen_simple_mesh=False, gen_inpainted_mesh=False)
    gen_obj = core_generation_funnel(None, input_images, None, None,
                                     first_pass,
                                     predictor_cache=predictor_cache)
    return [x[2] for x in gen_obj if x[1] == "depth_prediction"]


def gen_video(video_path: str, outpath: str, inp,
              custom_depthmap: Optional[str] = None,
              colorvids_bitrate: Optional[int] = None,
              smoothening: str = "none",
              predictor_cache=None) -> List[str]:
    """Full video flow; returns list of written video paths."""
    from depthmap_tpu.pipeline.core import core_generation_funnel

    inp = GenerationOptions.from_dict(inp)
    if inp.gen_simple_mesh or inp.gen_inpainted_mesh:
        raise Exception("Creating mesh-videos is not supported. Please split "
                        "video into frames and use batch processing.")

    fps, input_images = open_path_as_images(os.path.abspath(video_path))
    os.makedirs(outpath, exist_ok=True)

    if custom_depthmap is None:
        input_depths = _predict_video_depths(input_images, inp,
                                             predictor_cache)
        input_depths = process_predictions(input_depths, smoothening)
    else:
        _cdm_fps, input_depths = open_path_as_images(
            os.path.abspath(custom_depthmap), maybe_depthvideo=True)
        assert len(input_depths) == len(input_images), \
            "Custom depthmap video length does not match input video length"

    img_results = list(core_generation_funnel(
        None, input_images, input_depths, None, inp,
        predictor_cache=predictor_cache))
    gens = sorted(set(x[1] for x in img_results))

    written = []
    for gen in gens:
        if gen == "depth" and custom_depthmap is not None:
            continue
        imgs = [x[2] for x in img_results if x[1] == gen]
        if not imgs or not isinstance(imgs[0], Image.Image):
            continue
        basename = f"{gen}_video"
        seq = get_next_sequence_number(outpath, None)
        written += frames_to_video(fps, imgs, outpath,
                                   f"depthmap-{seq}-{basename}",
                                   colorvids_bitrate)
    return written
