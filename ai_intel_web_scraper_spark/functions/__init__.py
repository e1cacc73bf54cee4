"""Pure scalar/vector functions shared by the Spark engine and the Python oracle."""
