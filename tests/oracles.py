"""Pure-numpy oracles implementing the reference numerics, written directly
from the documented semantics (SURVEY.md §2 / reference file:line cites).
They are deliberately slow, loop-based, and independent of the JAX code under
test."""
import numpy as np


def convert_to_i16(arr):
    out = np.clip(arr * 65536 + 0.0001, 0, 65536 - 0.1)
    return out.astype("uint16")


def stereo_warp_naive(image, normalized_depth, divergence_px, separation_px,
                      exponent, fill):
    """Reference apply_stereo_divergence_naive (stereoimage_generation.py:95-159)."""
    h, w, c = image.shape
    derived = np.zeros_like(image)
    filled = np.zeros(h * w, dtype=np.uint8)
    for row in range(h):
        cols = range(w) if divergence_px < 0 else range(w - 1, -1, -1)
        for col in cols:
            col_d = col + int(
                (normalized_depth[row, col] ** exponent) * divergence_px
                + separation_px)
            if 0 <= col_d < w:
                derived[row, col_d] = image[row, col]
                filled[row * w + col_d] = 1

    if fill == "naive_interpolating":
        # canonical semantics = the reference's production numba path:
        # channel sums accumulate in int64 (numba promotes builtin sum) so
        # there is NO uint8 wraparound; the sweep mutates in place, so a
        # just-written exact-black pixel is re-processed (re-entry)
        def csum(px):
            return int(np.asarray(px, np.int64).sum())

        for row in range(h):
            for l_pointer in range(w):
                if csum(derived[row][l_pointer]) != 0 or filled[row * w + l_pointer]:
                    continue
                l_border = derived[row][l_pointer - 1].copy() if l_pointer > 0 \
                    else np.zeros(3, dtype=np.uint8)
                r_border = np.zeros(3, dtype=np.uint8)
                r_pointer = l_pointer + 1
                while r_pointer < w:
                    if csum(derived[row][r_pointer]) != 0 and filled[row * w + r_pointer]:
                        r_border = derived[row][r_pointer].copy()
                        break
                    r_pointer += 1
                if csum(l_border) == 0:
                    l_border = r_border
                elif csum(r_border) == 0:
                    r_border = l_border
                total_steps = 1 + r_pointer - l_pointer
                step = (r_border.astype(np.float64) - l_border) / total_steps
                for col in range(l_pointer, r_pointer):
                    derived[row][col] = l_border + \
                        (step * (col - l_pointer + 1)).astype(np.uint8)
        return derived
    elif fill == "naive":
        derived_fix = np.copy(derived)
        for pos in np.where(filled == 0)[0]:
            row = pos // w
            col = pos % w
            row_times_w = row * w
            for offset in range(1, abs(int(divergence_px)) + 2):
                r_offset = col + offset
                l_offset = col - offset
                if r_offset < w and filled[row_times_w + r_offset]:
                    derived_fix[row][col] = derived[row][r_offset]
                    break
                if 0 <= l_offset and filled[row_times_w + l_offset]:
                    derived_fix[row][col] = derived[row][l_offset]
                    break
        return derived_fix
    return derived


def stereo_polylines(image, normalized_depth, divergence_px, separation_px,
                     exponent, fill):
    """Reference apply_stereo_divergence_polylines (stereoimage_generation.py:162-283)."""
    EPSILON = 1e-7
    PIXEL_HALF_WIDTH = 0.45 if fill == "polylines_sharp" else 0.0
    h, w, c = image.shape
    derived = np.zeros_like(image)
    for row in range(h):
        pt = np.zeros((5 + 2 * w, 3), dtype=np.float64)
        pt_end = 0
        pt[pt_end] = [-1.0 * w, 0.0, 0.0]
        pt_end += 1
        for col in range(w):
            coord_d = (normalized_depth[row, col] ** exponent) * divergence_px
            coord_x = col + 0.5 + coord_d + separation_px
            if PIXEL_HALF_WIDTH < EPSILON:
                pt[pt_end] = [coord_x, abs(coord_d), col]
                pt_end += 1
            else:
                pt[pt_end] = [coord_x - PIXEL_HALF_WIDTH, abs(coord_d), col]
                pt[pt_end + 1] = [coord_x + PIXEL_HALF_WIDTH, abs(coord_d), col]
                pt_end += 2
        pt[pt_end] = [2.0 * w, 0.0, w - 1]
        pt_end += 1

        sg_end = pt_end - 1
        sg = np.zeros((sg_end, 6), dtype=np.float64)
        for i in range(sg_end):
            sg[i] += np.concatenate((pt[i], pt[i + 1]))

        for i in range(1, sg_end):
            u = i - 1
            while pt[u][0] > pt[u + 1][0] and 0 <= u:
                pt[u], pt[u + 1] = np.copy(pt[u + 1]), np.copy(pt[u])
                sg[u], sg[u + 1] = np.copy(sg[u + 1]), np.copy(sg[u])
                u -= 1

        csg = np.zeros((5 * int(abs(divergence_px)) + 25, 6), dtype=np.float64)
        csg_end = 0
        sg_pointer = 0
        pt_i = 0
        for col in range(w):
            color = np.full(c, 0.5, dtype=np.float64)
            while pt[pt_i][0] < col:
                pt_i += 1
            pt_i -= 1
            while pt[pt_i][0] < col + 1:
                coord_from = max(col, pt[pt_i][0]) + EPSILON
                coord_to = min(col + 1, pt[pt_i + 1][0]) - EPSILON
                significance = coord_to - coord_from
                coord_center = coord_from + 0.5 * significance

                while sg_pointer < sg_end and sg[sg_pointer][0] < coord_center:
                    csg[csg_end] = sg[sg_pointer]
                    sg_pointer += 1
                    csg_end += 1
                csg_i = 0
                while csg_i < csg_end:
                    if csg[csg_i][3] < coord_center:
                        csg[csg_i] = csg[csg_end - 1]
                        csg_end -= 1
                    else:
                        csg_i += 1
                best_csg_i = 0
                if csg_end != 1:
                    best_csg_closeness = -EPSILON
                    for csg_i in range(csg_end):
                        ip_k = (coord_center - csg[csg_i][0]) / \
                            (csg[csg_i][3] - csg[csg_i][0])
                        closeness = (1.0 - ip_k) * csg[csg_i][1] \
                            + ip_k * csg[csg_i][4]
                        if best_csg_closeness < closeness and 0.0 < ip_k < 1.0:
                            best_csg_closeness = closeness
                            best_csg_i = csg_i
                col_l = int(csg[best_csg_i][2] + EPSILON)
                col_r = int(csg[best_csg_i][5] + EPSILON)
                if col_l == col_r:
                    color += image[row][col_l] * significance
                else:
                    ip_k = (coord_center - csg[best_csg_i][0]) / \
                        (csg[best_csg_i][3] - csg[best_csg_i][0])
                    color += (image[row][col_l] * (1.0 - ip_k)
                              + image[row][col_r] * ip_k) * significance
                pt_i += 1
            derived[row][col] = np.asarray(color, dtype=np.uint8)
    return derived


def normalmap(depthmap, pre_blur, sobel_ksize, post_blur, invert):
    """Reference create_normalmap (normalmap_generation.py:5-56), float64 cv2."""
    import cv2
    normalmap = depthmap.astype(np.float64) if invert \
        else depthmap.astype(np.float64) * (-1.0)
    normalmap = normalmap / 256.0
    if pre_blur is not None and pre_blur > 0:
        normalmap = cv2.GaussianBlur(normalmap, (pre_blur, pre_blur), pre_blur)
    if sobel_ksize is not None and sobel_ksize > 0:
        zx = cv2.Sobel(np.float64(normalmap), cv2.CV_64F, 1, 0, ksize=sobel_ksize)
        zy = cv2.Sobel(np.float64(normalmap), cv2.CV_64F, 0, 1, ksize=sobel_ksize)
    else:
        zy, zx = np.gradient(normalmap)
    normal = np.dstack((zx, -zy, np.ones_like(normalmap)))
    n = np.linalg.norm(normal, axis=2)
    normal[:, :, 0] /= n
    normal[:, :, 1] /= n
    normal[:, :, 2] /= n
    if post_blur is not None and post_blur > 0:
        normal = cv2.GaussianBlur(normal, (post_blur, post_blur), post_blur)
        n = np.linalg.norm(normal, axis=2)
        normal[:, :, 0] /= n
        normal[:, :, 1] /= n
        normal[:, :, 2] /= n
    normal += 1
    normal /= 2
    normal = np.clip(normal * 256, 0, 256 - 0.1)
    return normal.astype(np.uint8)
