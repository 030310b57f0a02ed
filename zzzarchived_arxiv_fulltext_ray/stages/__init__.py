"""Ray Data ``map_batches`` callables: stateless task fns + actor pools."""
