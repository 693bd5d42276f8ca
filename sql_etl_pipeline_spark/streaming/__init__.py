from .ingest import CdcStreamIngestor

__all__ = ["CdcStreamIngestor"]
