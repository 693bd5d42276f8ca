from .generate import TRANSCRIPT_SCHEMA, change_event_schema, generate_change_events
from .apply import apply_batch, expected_final_state

__all__ = [
    "TRANSCRIPT_SCHEMA",
    "change_event_schema",
    "generate_change_events",
    "apply_batch",
    "expected_final_state",
]
