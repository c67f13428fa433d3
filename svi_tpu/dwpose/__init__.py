from .wholebody import Wholebody, keypoints_to_openpose
from .draw import draw_pose_frame

__all__ = ["Wholebody", "keypoints_to_openpose", "draw_pose_frame"]
