from clipx.data.pipeline import DecodeItem, iter_decoded, scan_folder  # noqa: F401
