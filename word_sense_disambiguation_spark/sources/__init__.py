"""Table sources/sinks: driver testdata catalog + pages table IO."""
