from coclr_tpu.data.lmdb_format import LMDBReader, write_lmdb

__all__ = ["LMDBReader", "write_lmdb"]
