"""Pure-numpy golden-matched primitives. No Spark imports allowed here —
these run inside Arrow-batched UDFs on executors and in driver-side tests.
"""
