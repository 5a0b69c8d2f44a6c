from opendwm_tpu.fs.czip import CombinedZipFileSystem  # noqa: F401
from opendwm_tpu.fs.ctar import CombinedTarFileSystem  # noqa: F401
from opendwm_tpu.fs.dirfs import DirFileSystem  # noqa: F401
from opendwm_tpu.fs.s3fs import ForkableS3FileSystem  # noqa: F401
