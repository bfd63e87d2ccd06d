"""Composed pipelines (logical plans) and the driver-contract query registry."""
