// Minimal shim of hyparquet schema-tree helpers used by the writer.

function schemaTree(schema, rootIndex, path) {
  const element = schema[rootIndex]
  const children = []
  let count = 1
  if (element.num_children) {
    while (children.length < element.num_children) {
      const childIndex = rootIndex + count
      const child = schemaTree(schema, childIndex, [...path, schema[childIndex].name])
      count += child.count
      children.push(child)
    }
  }
  return { count, element, children, path }
}

export function getSchemaPath(schema, name) {
  let tree = schemaTree(schema, 0, [])
  const path = [tree]
  for (const part of name) {
    const child = tree.children.find(c => c.element.name === part)
    if (!child) throw new Error(`parquet schema element not found: ${name}`)
    path.push(child)
    tree = child
  }
  return path
}

export function getMaxDefinitionLevel(schemaPath) {
  let maxLevel = 0
  for (const { element } of schemaPath.slice(1)) {
    if (element.repetition_type !== 'REQUIRED') maxLevel++
  }
  return maxLevel
}

export function getMaxRepetitionLevel(schemaPath) {
  let maxLevel = 0
  for (const { element } of schemaPath.slice(1)) {
    if (element.repetition_type === 'REPEATED') maxLevel++
  }
  return maxLevel
}

export function isListLike(schema) {
  if (!schema || schema.children.length !== 1) return false
  if (schema.element.converted_type !== 'LIST') return false
  const firstChild = schema.children[0]
  if (firstChild.element.repetition_type !== 'REPEATED') return false
  return true
}

export function isMapLike(schema) {
  if (!schema || schema.children.length !== 1) return false
  if (schema.element.converted_type !== 'MAP') return false
  const firstChild = schema.children[0]
  if (firstChild.element.repetition_type !== 'REPEATED') return false
  if (firstChild.children.length !== 2) return false
  return true
}
