from .kitti_raw import KittiRawLoader
from .kitti_odom import KittiOdomLoader
from .cityscapes import CityscapesLoader

__all__ = ["KittiRawLoader", "KittiOdomLoader", "CityscapesLoader"]
