from coclr_tpu.data.lmdb_format import LMDBReader, LMDBWriter, write_lmdb

__all__ = ["LMDBReader", "LMDBWriter", "write_lmdb"]
