"""Trajectory-video generation from inpainted meshes + the run_3dphoto
orchestration (reference src/core.py:365-667 + inpaint/utils.py:29-53).
"""
from __future__ import annotations

import copy
import os
from typing import List, Optional

import numpy as np
from PIL import Image
from scipy.interpolate import interp1d

from depthmap_tpu.io.image import get_next_sequence_number, get_unique_filename
from depthmap_tpu.pipeline.inpaint_mesh import (read_mesh,
                                                sparse_bilateral_filtering,
                                                write_mesh)
from depthmap_tpu.pipeline.render import MeshRenderer
from depthmap_tpu.pipeline.video_mode import frames_to_video

# module-level mesh cache (parity with reference core.py:37-39,537-544)
_video_mesh_data = None
_video_mesh_fn = None


def path_planning(num_frames: int, x: float, y: float, z: float,
                  path_type: str = ""):
    """Camera trajectories (reference inpaint/utils.py:29-53)."""
    if path_type == "straight-line":
        corner_points = np.array([[0, 0, 0],
                                  [(0 + x) * 0.5, (0 + y) * 0.5, (0 + z) * 0.5],
                                  [x, y, z]])
        corner_t = np.linspace(0, 1, len(corner_points))
        t = np.linspace(0, 1, num_frames)
        cs = interp1d(corner_t, corner_points, axis=0, kind="quadratic")
        spline = cs(t)
        xs, ys, zs = [xx.squeeze() for xx in np.split(spline, 3, 1)]
    elif path_type == "double-straight-line":
        corner_points = np.array([[-x, -y, -z], [0, 0, 0], [x, y, z]])
        corner_t = np.linspace(0, 1, len(corner_points))
        t = np.linspace(0, 1, num_frames)
        cs = interp1d(corner_t, corner_points, axis=0, kind="quadratic")
        spline = cs(t)
        xs, ys, zs = [xx.squeeze() for xx in np.split(spline, 3, 1)]
    elif path_type == "circle":
        xs, ys, zs = [], [], []
        for bs_shift_val in np.arange(-2.0, 2.0, (4.0 / num_frames)):
            xs += [np.cos(bs_shift_val * np.pi) * 1 * x]
            ys += [np.sin(bs_shift_val * np.pi) * 1 * y]
            zs += [np.cos(bs_shift_val * np.pi / 2.0) * 1 * z]
        xs, ys, zs = np.array(xs), np.array(ys), np.array(zs)
    else:
        raise ValueError(f"Unknown path type {path_type!r}")
    return xs, ys, zs


def output_3d_photo(verts, colors, faces, H, W, hfov, vfov, videos_poses,
                    video_postfixes, output_dir, video_basename, config,
                    mean_loc_depth, original_h=None, original_w=None,
                    dolly=False, fn_ext="mp4") -> List[str]:
    """Render trajectory videos (reference mesh.py:2413-2560 flow)."""
    original_h = original_h or H
    original_w = original_w or W
    fov_rad = max(hfov, vfov)
    canvas_size = max(original_h, original_w)
    ssaa = int(config.get("ssaa", 1))
    renderer = MeshRenderer(verts, colors, faces, fov_rad, canvas_size, ssaa,
                            method=config.get("render_method", "triangles"))
    plane_width = np.tan(fov_rad / 2.0) * abs(mean_loc_depth)

    aspect = original_h / original_w
    S = canvas_size
    if aspect > 1:
        img_h_len = original_h
        img_w_len = img_h_len / aspect
        anchor = [0, S, int(max(0, S // 2 - img_w_len // 2)),
                  int(min(S // 2 + img_w_len // 2, S - 1))]
    else:
        img_w_len = original_w
        img_h_len = img_w_len * aspect
        anchor = [int(max(0, S // 2 - img_h_len // 2)),
                  int(min(S // 2 + img_h_len // 2, S - 1)), 0, S]

    fn_saved = []
    fps = config.get("fps", 40)
    crop_border = config.get("crop_border", [0, 0, 0, 0])
    for poses, postfix in zip(videos_poses, video_postfixes):
        frames = []
        for tp in poses:
            shift = np.asarray(tp)[:3, 3]
            new_mean_loc = mean_loc_depth - float(-shift[2])
            if dolly or "dolly" in postfix:
                fov = float(np.arctan2(plane_width,
                                       abs(new_mean_loc))) * 2.0
            else:
                fov = fov_rad
            # reference applies inv(tp): camera moves opposite the pose shift
            img = renderer.render(-shift, fov)
            img = img[anchor[0]:anchor[1], anchor[2]:anchor[3]]
            if any(np.array(crop_border) > 0.0):
                hc, wc = img.shape[:2]
                o_t = int(hc * crop_border[0])
                o_l = int(wc * crop_border[1])
                o_b = int(hc * crop_border[2])
                o_r = int(wc * crop_border[3])
                img = img[o_t:hc - o_b, o_l:wc - o_r]
            frames.append(Image.fromarray(img))
        name = f"{video_basename}_{postfix}" if postfix else video_basename
        fn_saved += frames_to_video(fps, frames, output_dir, name)
    return fn_saved


def run_3dphoto_videos(mesh_fi: str, basename: str, outpath: str,
                       num_frames: int, fps: int, crop_border,
                       traj_types, x_shift_range, y_shift_range,
                       z_shift_range, video_postfix, vid_dolly, vid_format,
                       vid_ssaa) -> List[str]:
    """reference src/core.py:513-612."""
    global _video_mesh_data, _video_mesh_fn
    if _video_mesh_fn is None or _video_mesh_fn != mesh_fi:
        _video_mesh_fn = mesh_fi
        _video_mesh_data = read_mesh(mesh_fi)
    verts, colors, faces, H, W, hfov, vfov, mean_loc_depth = _video_mesh_data

    generic_pose = np.eye(4)
    assert len(traj_types) == len(x_shift_range) == len(y_shift_range) == \
        len(z_shift_range) == len(video_postfix)
    tgts_poses = []
    for ti in range(len(traj_types)):
        tgt_poses = []
        sx, sy, sz = path_planning(num_frames, x_shift_range[ti],
                                   y_shift_range[ti], z_shift_range[ti],
                                   path_type=traj_types[ti])
        for xx, yy, zz in zip(sx, sy, sz):
            pose = generic_pose.copy()
            pose[:3, 3] = [xx, yy, zz]
            tgt_poses.append(pose)
        tgts_poses.append(tgt_poses)

    config = {"fps": fps, "crop_border": crop_border, "ssaa": vid_ssaa}
    return output_3d_photo(verts, colors, faces, H, W, hfov, vfov,
                           tgts_poses, video_postfix, outpath, basename,
                           config, mean_loc_depth, original_h=H,
                           original_w=W, dolly=vid_dolly, fn_ext=vid_format)


def run_makevideo(fn_mesh: str, vid_numframes, vid_fps, vid_traj, vid_shift,
                  vid_border, dolly, vid_format, vid_ssaa, outpath=None,
                  basename=None):
    """reference src/core.py:614-667 (the 'Generate video' tab / API)."""
    if len(fn_mesh) == 0 or not os.path.exists(fn_mesh):
        raise Exception("Could not open mesh.")
    vid_ssaa = int(vid_ssaa)
    if vid_traj == 0:
        vid_traj = ["straight-line"]
    elif vid_traj == 1:
        vid_traj = ["double-straight-line"]
    elif vid_traj == 2:
        vid_traj = ["circle"]
    elif isinstance(vid_traj, str):
        vid_traj = [vid_traj]

    num_fps = int(vid_fps)
    num_frames = int(vid_numframes)
    shifts = vid_shift.split(",") if isinstance(vid_shift, str) else vid_shift
    if len(shifts) != 3:
        raise Exception("Translate requires 3 elements.")
    x_shift_range = [float(shifts[0])]
    y_shift_range = [float(shifts[1])]
    z_shift_range = [float(shifts[2])]

    borders = vid_border.split(",") if isinstance(vid_border, str) \
        else vid_border
    if len(borders) != 4:
        raise Exception("Crop Border requires 4 elements.")
    crop_border = [float(b) for b in borders]

    outpath = outpath or "./outputs"
    if not basename:
        basename = os.path.splitext(os.path.basename(fn_mesh))[0]

    fn_saved = run_3dphoto_videos(
        fn_mesh, basename, outpath, num_frames, num_fps, crop_border,
        vid_traj, x_shift_range, y_shift_range, z_shift_range, [""],
        dolly, vid_format, vid_ssaa)
    return fn_saved[-1], fn_saved[-1], ""


def run_3dphoto(device_unused, inpaint_imgs, inpaint_depths, inputnames,
                outpath, gen_inpainted_mesh_demos, vid_ssaa, vid_format,
                nets: Optional[dict] = None) -> str:
    """reference src/core.py:365-510: depth prep + bilateral filtering +
    write_mesh (+ optional 4-trajectory demo videos)."""
    import cv2
    mesh_fi = ""
    if nets is None:
        from depthmap_tpu.pipeline.inpaint_mesh import build_inpaint_callables
        nets = build_inpaint_callables()   # None -> diffusion fallback
    config = {
        "extrapolation_thickness": 60, "extrapolate_border": True,
        "depth_threshold": 0.04, "redundant_number": 12,
        "ext_edge_threshold": 0.002, "background_thickness": 70,
        "context_thickness": 140, "background_thickness_2": 70,
        "context_thickness_2": 70, "log_depth": True,
        "depth_edge_dilate": 10, "depth_edge_dilate_2": 5,
        "largest_size": 512, "repeat_inpaint_edge": True,
        "ply_fmt": "bin", "save_ply": False, "save_obj": True,
        "sparse_iter": 5, "filter_size": [7, 7, 5, 5, 5],
        "sigma_s": 4.0, "sigma_r": 0.5,
    }
    for count in range(len(inpaint_imgs)):
        basename = "depthmap"
        if inputnames is not None and inputnames[count] is not None:
            basename = os.path.splitext(os.path.basename(
                str(inputnames[count])))[0]
        os.makedirs(outpath, exist_ok=True)
        mesh_fi = get_unique_filename(outpath, basename, "obj")

        img = np.asarray(inpaint_imgs[count])
        if img.ndim > 2 and img.shape[2] == 4:
            img = img[..., :3]
        W = img.shape[1]
        H = img.shape[0]
        int_mtx = np.array([[max(H, W), 0, W // 2],
                            [0, max(H, W), H // 2],
                            [0, 0, 1]]).astype(np.float32)
        if int_mtx.max() > 1:
            int_mtx[0, :] = int_mtx[0, :] / float(W)
            int_mtx[1, :] = int_mtx[1, :] / float(H)

        # depth ingestion (reference core.py:456-460)
        disp = np.asarray(inpaint_depths[count]).astype(np.float32)
        disp = disp - disp.min()
        disp = cv2.blur(disp / disp.max(), ksize=(3, 3)) * disp.max()
        disp = (disp / disp.max()) * 3.0
        depth = 1.0 / np.maximum(disp, 0.05)

        _imgs, depths = sparse_bilateral_filtering(
            depth.copy(), img.copy(), config["filter_size"],
            config["depth_threshold"], num_iter=config["sparse_iter"])
        depth = depths[-1]

        write_mesh(img, depth, int_mtx, mesh_fi, config, nets=nets)

        if gen_inpainted_mesh_demos:
            run_3dphoto_videos(mesh_fi, basename, outpath, 300, 40,
                               [0.03, 0.03, 0.05, 0.03],
                               ["double-straight-line", "double-straight-line",
                                "circle", "circle"],
                               [0.00, 0.00, -0.015, -0.015],
                               [0.00, 0.00, -0.015, -0.00],
                               [-0.05, -0.05, -0.05, -0.05],
                               ["dolly-zoom-in", "zoom-in", "circle", "swing"],
                               False, vid_format, vid_ssaa)
    return mesh_fi
