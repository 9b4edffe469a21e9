from gangealing_tpu.data.lmdb_io import LMDBReader, write_lmdb
from gangealing_tpu.data.dataset import (
    MultiResolutionDataset, PCKDataset, DataLoader, img_dataloader,
    pck_dataloader, sample_infinite_data, sample_infinite_pck_data, Subset)
