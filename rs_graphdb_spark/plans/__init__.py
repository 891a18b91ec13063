"""Plan-level utilities: result caching, physical layout."""
