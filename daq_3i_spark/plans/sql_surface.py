"""op_sql_surface — relational surface over the TPC-H-ish tables — milestone M4."""
