"""Batch sources: format dispatch, nested-record flattening."""
