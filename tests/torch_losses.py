"""Test-only torch mirror of the reference TRAINING MATH.

An independent, compact torch implementation of the reference's loss
pipeline — SSIM, inverse warp, pairwise photometric/geometry loss with all
three masks, and edge-aware smoothness — used as the golden oracle for the
full-step numerical parity test (tests/test_fullstep_parity.py).

Behavioral spec (not code) taken from:
  /root/reference/loss_functions.py:11-159 (SSIM, pairwise + multi-scale
  loss, mean_on_mask >10000 guard, smoothness)
  /root/reference/inverse_warp.py:8-17,77-114,139-154,194-269 (pixel grid,
  euler2mat = Rx@Ry@Rz, pose_vec2mat, cam2pixel2 with clamp(Z,1e-3) and the
  out-of-range→2 coordinate trick, inverse_warp2 with align_corners=False)

All tensors NCHW (torch convention), fp32.
"""

import torch
import torch.nn.functional as F

_C1, _C2 = 0.01 ** 2, 0.03 ** 2


def ssim_map(x, y):
    """Dissimilarity map (1 - SSIM)/2 in [0,1] via the 3x3-avgpool
    formulation on reflect-padded inputs."""
    xp, yp = F.pad(x, (1, 1, 1, 1), "reflect"), F.pad(y, (1, 1, 1, 1), "reflect")
    pool = lambda t: F.avg_pool2d(t, 3, 1)
    mx, my = pool(xp), pool(yp)
    vx = pool(xp * xp) - mx * mx
    vy = pool(yp * yp) - my * my
    cxy = pool(xp * yp) - mx * my
    num = (2 * mx * my + _C1) * (2 * cxy + _C2)
    den = (mx * mx + my * my + _C1) * (vx + vy + _C2)
    return torch.clamp((1 - num / den) / 2, 0, 1)


def rotation_from_euler(r):
    """[B,3] (rx, ry, rz) -> [B,3,3], composed as Rx @ Ry @ Rz."""
    x, y, z = r.unbind(1)
    cx, sx, cy, sy, cz, sz = x.cos(), x.sin(), y.cos(), y.sin(), z.cos(), z.sin()
    o, l = torch.zeros_like(x), torch.ones_like(x)
    rx = torch.stack([l, o, o, o, cx, -sx, o, sx, cx], 1).view(-1, 3, 3)
    ry = torch.stack([cy, o, sy, o, l, o, -sy, o, cy], 1).view(-1, 3, 3)
    rz = torch.stack([cz, -sz, o, sz, cz, o, o, o, l], 1).view(-1, 3, 3)
    return rx @ ry @ rz


def pose_to_mat(vec):
    """[B,6] (tx ty tz rx ry rz) -> [B,3,4]."""
    return torch.cat([rotation_from_euler(vec[:, 3:]), vec[:, :3, None]], 2)


def warp_to_target(img, tgt_depth, ref_depth, pose, intrinsics,
                   padding_mode="zeros"):
    """Reference inverse_warp2 semantics.

    img/ref_depth: source image [B,3,H,W] and depth [B,1,H,W];
    tgt_depth: target depth [B,1,H,W]; pose: [B,6] target->source.
    Returns (warped_img, valid_mask, projected_depth, computed_depth).
    """
    b, _, h, w = img.shape
    jj, ii = torch.meshgrid(
        torch.arange(w, dtype=img.dtype), torch.arange(h, dtype=img.dtype),
        indexing="xy",
    )
    grid = torch.stack([jj, ii, torch.ones_like(jj)]).view(1, 3, -1)  # [1,3,HW]
    cam = (torch.inverse(intrinsics) @ grid.expand(b, 3, h * w))
    cam = cam * tgt_depth.view(b, 1, h * w)

    proj = intrinsics @ pose_to_mat(pose)  # [B,3,4]
    p = proj[:, :, :3] @ cam + proj[:, :, 3:]
    z = p[:, 2].clamp(min=1e-3)
    xn = 2 * (p[:, 0] / z) / (w - 1) - 1
    yn = 2 * (p[:, 1] / z) / (h - 1) - 1
    if padding_mode == "zeros":
        # out-of-frame coordinates are pushed far outside so the bilinear
        # sample is pure zero, never a border/zero blend
        xn = torch.where(((xn > 1) | (xn < -1)).detach(), torch.full_like(xn, 2), xn)
        yn = torch.where(((yn > 1) | (yn < -1)).detach(), torch.full_like(yn, 2), yn)
    coords = torch.stack([xn, yn], -1).view(b, h, w, 2)

    warped = F.grid_sample(img, coords, padding_mode=padding_mode,
                           align_corners=False)
    proj_depth = F.grid_sample(ref_depth, coords, padding_mode=padding_mode,
                               align_corners=False)
    valid = (coords.abs().amax(-1) <= 1).float().unsqueeze(1)
    return warped, valid, proj_depth, z.view(b, 1, h, w)


def masked_mean(diff, valid):
    """Mean of diff over the (channel-broadcast) mask; 0 if the mask covers
    <= 10000 elements."""
    m = valid.expand_as(diff)
    s = m.sum()
    if s > 10000:
        return (diff * m).sum() / s
    return torch.zeros((), dtype=diff.dtype)


def pair_loss(tgt_img, ref_img, tgt_depth, ref_depth, pose, intrinsics,
              with_ssim, with_mask, with_auto_mask, padding_mode):
    """One directed (target<-source) photometric + geometry-consistency
    loss with validity/auto/self-discovered masks."""
    warped, valid, proj_d, comp_d = warp_to_target(
        ref_img, tgt_depth, ref_depth, pose, intrinsics, padding_mode)

    diff_img = (tgt_img - warped).abs().clamp(0, 1)
    diff_depth = ((comp_d - proj_d).abs() / (comp_d + proj_d)).clamp(0, 1)

    if with_auto_mask:
        keep = (diff_img.mean(1, keepdim=True)
                < (tgt_img - ref_img).abs().mean(1, keepdim=True)).float()
        valid = keep * valid
    if with_ssim:
        diff_img = 0.15 * diff_img + 0.85 * ssim_map(tgt_img, warped)
    if with_mask:
        diff_img = diff_img * (1 - diff_depth)

    return masked_mean(diff_img, valid), masked_mean(diff_depth, valid)


def photometric_geometry_loss(tgt_img, ref_imgs, intrinsics, tgt_depth,
                              ref_depths, poses, poses_inv, max_scales=1,
                              with_ssim=True, with_mask=True,
                              with_auto_mask=False, padding_mode="zeros"):
    """Bidirectional loss summed over refs x scales; low-res depths are
    nearest-upsampled to full resolution."""
    h, w = tgt_img.shape[2:]
    up = lambda d: d if d.shape[2:] == (h, w) else F.interpolate(d, (h, w), mode="nearest")
    photo = geom = 0
    for ref_img, ref_depth, pose, pose_inv in zip(ref_imgs, ref_depths, poses, poses_inv):
        for s in range(min(len(tgt_depth), max_scales)):
            td, rd = up(tgt_depth[s]), up(ref_depth[s])
            p1, g1 = pair_loss(tgt_img, ref_img, td, rd, pose, intrinsics,
                               with_ssim, with_mask, with_auto_mask, padding_mode)
            p2, g2 = pair_loss(ref_img, tgt_img, rd, td, pose_inv, intrinsics,
                               with_ssim, with_mask, with_auto_mask, padding_mode)
            photo = photo + p1 + p2
            geom = geom + g1 + g2
    return photo, geom


def edge_smooth_loss(tgt_depth, tgt_img, ref_depths, ref_imgs):
    """Edge-aware first-order smoothness of mean-normalized scale-0 depth,
    over the target and every reference frame."""

    def one(depth, img):
        d = depth / (depth.mean((2, 3), keepdim=True) + 1e-7)
        dx = (d[:, :, :, :-1] - d[:, :, :, 1:]).abs()
        dy = (d[:, :, :-1, :] - d[:, :, 1:, :]).abs()
        ix = (img[:, :, :, :-1] - img[:, :, :, 1:]).abs().mean(1, keepdim=True)
        iy = (img[:, :, :-1, :] - img[:, :, 1:, :]).abs().mean(1, keepdim=True)
        return (dx * (-ix).exp()).mean() + (dy * (-iy).exp()).mean()

    loss = one(tgt_depth[0], tgt_img)
    for rd, ri in zip(ref_depths, ref_imgs):
        loss = loss + one(rd[0], ri)
    return loss
