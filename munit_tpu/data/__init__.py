from munit_tpu.data.datasets import (  # noqa: F401
    ImageFilelist, ImageFolder, ImageMaskDataset, SyntheticPairDataset,
    FidPairDataset, read_filelist,
)
from munit_tpu.data.loader import DataLoader, device_prefetch  # noqa: F401
from munit_tpu.data.api import (  # noqa: F401
    get_all_data_loaders, get_data_loader_mask_and_im,
    get_synthetic_data_loader, get_fid_data_loader, get_data_loader_folder,
    get_data_loader_list,
)
