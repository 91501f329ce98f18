"""Host-side utilities: meters, logging, video/image IO."""
