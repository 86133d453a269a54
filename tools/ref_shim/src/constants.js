// Minimal shim of hyparquet's public parquet enum name lists (values are
// the Apache Parquet Thrift enum orders) — only what the writer imports.
export const ParquetTypes = [
  'BOOLEAN', 'INT32', 'INT64', 'INT96', 'FLOAT', 'DOUBLE', 'BYTE_ARRAY', 'FIXED_LEN_BYTE_ARRAY',
]
export const Encodings = [
  'PLAIN', 'GROUP_VAR_INT', 'PLAIN_DICTIONARY', 'RLE', 'BIT_PACKED',
  'DELTA_BINARY_PACKED', 'DELTA_LENGTH_BYTE_ARRAY', 'DELTA_BYTE_ARRAY',
  'RLE_DICTIONARY', 'BYTE_STREAM_SPLIT',
]
export const CompressionCodecs = [
  'UNCOMPRESSED', 'SNAPPY', 'GZIP', 'LZO', 'BROTLI', 'LZ4', 'ZSTD', 'LZ4_RAW',
]
export const ConvertedTypes = [
  'UTF8', 'MAP', 'MAP_KEY_VALUE', 'LIST', 'ENUM', 'DECIMAL', 'DATE',
  'TIME_MILLIS', 'TIME_MICROS', 'TIMESTAMP_MILLIS', 'TIMESTAMP_MICROS',
  'UINT_8', 'UINT_16', 'UINT_32', 'UINT_64', 'INT_8', 'INT_16', 'INT_32',
  'INT_64', 'JSON', 'BSON', 'INTERVAL',
]
export const FieldRepetitionTypes = ['REQUIRED', 'OPTIONAL', 'REPEATED']
export const PageTypes = ['DATA_PAGE', 'INDEX_PAGE', 'DICTIONARY_PAGE', 'DATA_PAGE_V2']
export const BoundaryOrders = ['UNORDERED', 'ASCENDING', 'DESCENDING']
export const EdgeInterpolationAlgorithms = ['SPHERICAL', 'VINCENTY', 'THOMAS', 'ANDOYER', 'KARNEY']
