"""End-to-end Dataset graph builders."""
