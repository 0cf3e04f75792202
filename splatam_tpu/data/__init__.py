"""Dataset loaders (host-side numpy). Parity: datasets/gradslam_datasets."""
from splatam_tpu.data.base import GradSLAMDataset  # noqa: F401
from splatam_tpu.data.dataconfig import load_dataset_config  # noqa: F401
from splatam_tpu.data.misc_datasets import (  # noqa: F401
    AzureKinectDataset,
    ICLDataset,
    Record3DDataset,
    RealsenseDataset,
)
from splatam_tpu.data.nerfcapture import NeRFCaptureDataset  # noqa: F401
from splatam_tpu.data.replica import ReplicaDataset, ReplicaV2Dataset  # noqa: F401
from splatam_tpu.data.scannet import Ai2thorDataset, ScannetDataset  # noqa: F401
from splatam_tpu.data.scannetpp import ScannetPPDataset  # noqa: F401
from splatam_tpu.data.synthetic import SyntheticDataset  # noqa: F401
from splatam_tpu.data.tum import TUMDataset  # noqa: F401


def get_dataset(config_dict, basedir, sequence, **kwargs):
    """Dataset factory. Parity: scripts/splatam.py:40-64 (+ 'synthetic')."""
    name = config_dict["dataset_name"].lower()
    if name in ["icl"]:
        return ICLDataset(config_dict, basedir, sequence, **kwargs)
    elif name in ["replica"]:
        return ReplicaDataset(config_dict, basedir, sequence, **kwargs)
    elif name in ["replicav2"]:
        return ReplicaV2Dataset(config_dict, basedir, sequence, **kwargs)
    elif name in ["azure", "azurekinect"]:
        return AzureKinectDataset(config_dict, basedir, sequence, **kwargs)
    elif name in ["scannet"]:
        return ScannetDataset(config_dict, basedir, sequence, **kwargs)
    elif name in ["ai2thor"]:
        return Ai2thorDataset(config_dict, basedir, sequence, **kwargs)
    elif name in ["record3d"]:
        return Record3DDataset(config_dict, basedir, sequence, **kwargs)
    elif name in ["realsense"]:
        return RealsenseDataset(config_dict, basedir, sequence, **kwargs)
    elif name in ["tum"]:
        return TUMDataset(config_dict, basedir, sequence, **kwargs)
    elif name in ["scannetpp"]:
        return ScannetPPDataset(basedir, sequence, **kwargs)
    elif name in ["nerfcapture"]:
        return NeRFCaptureDataset(basedir, sequence, **kwargs)
    elif name in ["synthetic"]:
        synth_kwargs = {
            "num_frames": config_dict.get("num_frames", 30),
            "height": kwargs.get("desired_height", 120),
            "width": kwargs.get("desired_width", 160),
            "seed": config_dict.get("synthetic_seed", 0),
            "motion_scale": config_dict.get("motion_scale", 1.0),
            "depth_noise_sigma": config_dict.get("depth_noise_sigma", 0.0),
            "trajectory": config_dict.get("trajectory", "pan"),
            "texture_octaves": config_dict.get("texture_octaves", 2),
        }
        return SyntheticDataset(**synth_kwargs)
    else:
        raise ValueError(f"Unknown dataset name {config_dict['dataset_name']}")
