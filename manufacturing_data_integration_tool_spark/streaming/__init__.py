from .file_pipeline import start_file_stream, windowed_event_counts, sessionized_counts

__all__ = ["start_file_stream", "windowed_event_counts", "sessionized_counts"]
