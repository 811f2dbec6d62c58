from maxsquareloss_tpu.data.cityscapes import (
    CITYSCAPES_ID_TO_TRAINID,
    CityscapesDataset,
    SegDataset,
)
from maxsquareloss_tpu.data.crosscity import CITIES, CrossCityDataset
from maxsquareloss_tpu.data.gta5 import GTA5Dataset
from maxsquareloss_tpu.data.loader import SegDataLoader, device_prefetch
from maxsquareloss_tpu.data.palette import (
    IMG_MEAN,
    LABEL_COLOURS,
    decode_labels,
    inv_preprocess,
)
from maxsquareloss_tpu.data.synthetic import SyntheticSegDataset
from maxsquareloss_tpu.data.synthia import SYNTHIA_ID_TO_TRAINID, SynthiaDataset
from maxsquareloss_tpu.data.transforms import TransformConfig
