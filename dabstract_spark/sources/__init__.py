"""Non-parquet sources: folder/binary scans and file decoders
(reference: /root/reference/dabstract/dataset/helpers.py:187-400 —
``get_dir_info`` / ``FolderDictSeqAbstract`` — and the file readers in
processors.py:16-90)."""

from dabstract_spark.sources.folder import (
    attach_csv_metadata,
    folder_dataset,
    get_dir_info,
)
from dabstract_spark.sources.jsonl import read_jsonl
from dabstract_spark.sources.readers import (
    decode_image,
    decode_npy,
    decode_wav,
    sample_video_frames,
    wav_info,
)

__all__ = [
    "get_dir_info",
    "folder_dataset",
    "attach_csv_metadata",
    "decode_wav",
    "decode_npy",
    "wav_info",
    "decode_image",
    "sample_video_frames",
    "read_jsonl",
]
