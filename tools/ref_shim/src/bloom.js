// shim: only needed when bloom filters are enabled (we don't enable them)
export function hashParquetValue() {
  throw new Error('bloom shim: not implemented')
}
