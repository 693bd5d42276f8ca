from .table import CommitConflict, LakeTable

__all__ = ["LakeTable", "CommitConflict"]
