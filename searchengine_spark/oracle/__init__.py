from .oracle import OracleIndex, build_oracle

__all__ = ["OracleIndex", "build_oracle"]
