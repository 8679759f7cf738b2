"""End-to-end query plans.

- ``flight_queries`` : the reference's five queries on their native schemas
- ``synthetic``      : the same operators (plus the extension tier) mapped
                       onto the driver's TPC-H-ish tables, with matching
                       DuckDB oracle SQL for differential testing
"""
