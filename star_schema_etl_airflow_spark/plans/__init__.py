"""Query plans: star-schema builders (dims, facts, datamarts) and the
oracle-checked fixture query registry."""
