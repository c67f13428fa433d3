"""ONNX inference helpers for DWPose preprocessing (offline only).

Behavioral reference: dwpose/onnxdet.py (YOLOX-L person detection: keep-ratio
114-pad resize to 640², grid decode, class-agnostic NMS) and dwpose/onnxpose.py
(top-down DWPose: bbox -> 288x384 affine crop, SimCC argmax decode). These are
the standard YOLOX / mmpose-SimCC post-processing algorithms. Requires
onnxruntime sessions created by wholebody.Wholebody.
"""

from __future__ import annotations

import numpy as np


def _preprocess_det(img: np.ndarray, input_size=(640, 640)):
    padded = np.ones((input_size[0], input_size[1], 3), dtype=np.uint8) * 114
    r = min(input_size[0] / img.shape[0], input_size[1] / img.shape[1])
    import cv2

    resized = cv2.resize(
        img, (int(img.shape[1] * r), int(img.shape[0] * r)),
        interpolation=cv2.INTER_LINEAR,
    ).astype(np.uint8)
    padded[: resized.shape[0], : resized.shape[1]] = resized
    padded = padded.transpose(2, 0, 1)[None].astype(np.float32)
    return np.ascontiguousarray(padded), r


def _yolox_decode(outputs: np.ndarray, input_size=(640, 640), p6=False):
    """Raw YOLOX head outputs -> absolute xywh boxes (standard grid decode)."""
    strides = [8, 16, 32] if not p6 else [8, 16, 32, 64]
    grids, expanded_strides = [], []
    hsizes = [input_size[0] // s for s in strides]
    wsizes = [input_size[1] // s for s in strides]
    for h, w, stride in zip(hsizes, wsizes, strides):
        xv, yv = np.meshgrid(np.arange(w), np.arange(h))
        grid = np.stack((xv, yv), 2).reshape(1, -1, 2)
        grids.append(grid)
        expanded_strides.append(np.full((*grid.shape[:2], 1), stride))
    grids = np.concatenate(grids, 1)
    expanded_strides = np.concatenate(expanded_strides, 1)
    outputs[..., :2] = (outputs[..., :2] + grids) * expanded_strides
    outputs[..., 2:4] = np.exp(outputs[..., 2:4]) * expanded_strides
    return outputs


def _nms(boxes, scores, iou_thr=0.45):
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = (w * h) / (areas[i] + areas[order[1:]] - w * h)
        order = order[np.where(ovr <= iou_thr)[0] + 1]
    return keep


def inference_detector(session, img: np.ndarray, score_thr=0.3, nms_thr=0.45):
    """-> (n, 4) person boxes in image coords (x1, y1, x2, y2)."""
    inp, ratio = _preprocess_det(img)
    out = session.run(None, {session.get_inputs()[0].name: inp})[0]
    preds = _yolox_decode(out[0][None] if out.ndim == 2 else out)[0]
    boxes_xywh = preds[:, :4]
    scores = preds[:, 4:5] * preds[:, 5:]
    boxes = np.empty_like(boxes_xywh)
    boxes[:, 0] = boxes_xywh[:, 0] - boxes_xywh[:, 2] / 2
    boxes[:, 1] = boxes_xywh[:, 1] - boxes_xywh[:, 3] / 2
    boxes[:, 2] = boxes_xywh[:, 0] + boxes_xywh[:, 2] / 2
    boxes[:, 3] = boxes_xywh[:, 1] + boxes_xywh[:, 3] / 2
    boxes /= ratio
    cls_scores = scores[:, 0]  # person class
    valid = cls_scores > score_thr
    boxes, cls_scores = boxes[valid], cls_scores[valid]
    if len(boxes) == 0:
        return np.zeros((0, 4), np.float32)
    keep = _nms(boxes, cls_scores, nms_thr)
    return boxes[keep].astype(np.float32)


def _bbox_to_center_scale(bbox, padding=1.25):
    x1, y1, x2, y2 = bbox
    center = np.array([(x1 + x2) / 2, (y1 + y2) / 2], np.float32)
    scale = np.array([(x2 - x1), (y2 - y1)], np.float32) * padding
    return center, scale


def _crop(img, center, scale, out_size=(288, 384)):
    """Affine top-down crop with aspect fix (mmpose convention)."""
    import cv2

    w, h = out_size
    aspect = w / h
    sw, sh = scale
    if sw > aspect * sh:
        sh = sw / aspect
    else:
        sw = sh * aspect
    rot_mat = cv2.getRotationMatrix2D((float(center[0]), float(center[1])), 0, 1.0)
    rot_mat[0, 2] += w / 2 - center[0]
    rot_mat[1, 2] += h / 2 - center[1]
    rot_mat[0] *= w / sw
    rot_mat[1] *= h / sh
    rot_mat[0, 2] += (1 - w / sw) * (center[0] + w / 2 - center[0]) * 0  # keep center
    warp = cv2.getAffineTransform(
        np.array([center - np.array([sw / 2, sh / 2]),
                  center + np.array([sw / 2, -sh / 2]),
                  center + np.array([sw / 2, sh / 2])], np.float32),
        np.array([[0, 0], [w, 0], [w, h]], np.float32),
    )
    return cv2.warpAffine(img, warp, (w, h)), (sw, sh)


def inference_pose(session, det_boxes: np.ndarray, img: np.ndarray,
                   input_size=(288, 384), simcc_ratio=2.0):
    """Top-down DWPose: per detected person, SimCC decode to image coords.
    -> keypoints (n, 133, 2), scores (n, 133)."""
    if len(det_boxes) == 0:
        det_boxes = np.array([[0, 0, img.shape[1], img.shape[0]]], np.float32)
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    all_kpts, all_scores = [], []
    for bbox in det_boxes:
        center, scale = _bbox_to_center_scale(bbox)
        crop, (sw, sh) = _crop(img, center, scale, input_size)
        inp = ((crop.astype(np.float32) - mean) / std).transpose(2, 0, 1)[None]
        simcc_x, simcc_y = session.run(None, {session.get_inputs()[0].name: inp})
        # SimCC argmax decode
        x_locs = simcc_x[0].argmax(axis=1).astype(np.float32) / simcc_ratio
        y_locs = simcc_y[0].argmax(axis=1).astype(np.float32) / simcc_ratio
        conf = np.minimum(simcc_x[0].max(axis=1), simcc_y[0].max(axis=1))
        kpts = np.stack([x_locs, y_locs], axis=-1)
        # back to image coords
        kpts[:, 0] = kpts[:, 0] / input_size[0] * sw + center[0] - sw / 2
        kpts[:, 1] = kpts[:, 1] / input_size[1] * sh + center[1] - sh / 2
        all_kpts.append(kpts)
        all_scores.append(conf)
    return np.stack(all_kpts), np.stack(all_scores)
